"""Golden-snapshot corpus harness (≅ /root/reference/test/corpus.test.js):
content-blind invariants over every synthetic archive, a SHA-256
baseline written on first run (UPDATE_SNAPSHOTS=1 refreshes), and
determinism + string/bytes input equivalence."""

import hashlib
import json
import os

import pytest

from mhtml_to_html_spark.mime import parse_mhtml
from mhtml_to_html_spark.sources.corpus import build_archive

N_CORPUS = 40
SNAPSHOT_PATH = os.path.join(os.path.dirname(__file__), "snapshots.json")


def corpus():
    for i in range(N_CORPUS):
        yield f"arc_{i:06d}", build_archive(i, 3)


def archive_digest(result) -> dict:
    h = hashlib.sha256()
    for part in result.parts:
        h.update(part.part_id.encode())
        h.update(b"\x00")
        h.update(part.data)
        h.update(b"\x00")
    return {
        "hash": h.hexdigest(),
        "n_parts": len(result.parts),
        "index": result.index,
        "anomalies": sorted(a["type"] for a in result.anomalies),
    }


@pytest.mark.parametrize("archive_id,raw", list(corpus()), ids=[c[0] for c in corpus()])
def test_invariants(archive_id, raw):
    result = parse_mhtml(raw)
    # every corpus archive holds a page and reports nothing anomalous
    assert result.index is not None, "no index document"
    assert result.anomalies == []
    assert all(p.part_id for p in result.parts)
    ids = [p.part_id for p in result.parts]
    assert len(ids) == len(set(ids)), "duplicate part ids"
    index_part = next(p for p in result.parts if p.part_id == result.index)
    assert index_part.text and "<html" in index_part.text.lower()
    assert "�" not in index_part.text, "stale charset damage in the page"


def test_determinism():
    # convert twice ⇒ identical (corpus.test.js:73-76)
    for archive_id, raw in corpus():
        a = archive_digest(parse_mhtml(raw))
        b = archive_digest(parse_mhtml(raw))
        assert a == b, f"{archive_id} parsed differently twice"


def test_string_and_bytes_input_equivalence():
    for archive_id, raw in list(corpus())[:10]:
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            continue  # non-UTF8 archives have no string form
        assert archive_digest(parse_mhtml(raw)) == archive_digest(parse_mhtml(text))


def test_golden_snapshots():
    digests = {archive_id: archive_digest(parse_mhtml(raw)) for archive_id, raw in corpus()}
    if not os.path.exists(SNAPSHOT_PATH) or os.environ.get("UPDATE_SNAPSHOTS") == "1":
        with open(SNAPSHOT_PATH, "w") as f:
            json.dump(digests, f, indent=1, sort_keys=True)
    with open(SNAPSHOT_PATH) as f:
        baseline = json.load(f)
    assert digests == baseline, "parse output drifted from the recorded baseline"
