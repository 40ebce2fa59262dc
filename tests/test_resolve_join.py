"""The reference-resolution equi-join (U3 as a DataFrame operator)
agrees with the pure-Python lookup for every reference in the corpus
documents, including cid: and raw-spelling fallbacks."""

import re

import pytest

from mhtml_to_html_spark.mime import parse_mhtml
from mhtml_to_html_spark.operators.registry import (
    registry_keys,
    resolve_references,
    unfound_references,
)
from mhtml_to_html_spark.operators.resolve import resolve_reference
from mhtml_to_html_spark.operators.split import split_archives
from mhtml_to_html_spark.sources.corpus import build_archive
from mhtml_to_html_spark.urlnorm import resolve_path
from tests.helpers.mhtml_builder import resources_of


def _refs_of(archive_idx: int):
    """(ref, base) pairs: every img src in the archive's index doc,
    plus a miss and a cid spelling."""
    result = parse_mhtml(build_archive(archive_idx, 3))
    index = next(p for p in result.parts if p.part_id == result.index)
    refs = re.findall(r'src="([^"]+)"', index.text)
    refs += ["missing.png", "cid:nope"]
    return result, index.part_id, refs


@pytest.mark.spark
def test_join_matches_pure_lookup(spark):
    rows = []
    expected = {}
    archives = []
    for idx in range(4):
        result, base, refs = _refs_of(idx)
        archive_id = f"arc_{idx:06d}"
        archives.append((archive_id, bytearray(build_archive(idx, 3))))
        resources = resources_of(result)
        for ref in refs:
            resolved = resolve_path(ref, base)
            rows.append((archive_id, ref, resolved))
            part = resolve_reference(resources, ref, base)
            expected[(archive_id, ref)] = part.part_id if part else None

    refs_df = spark.createDataFrame(rows, "archive_id string, ref string, resolved string")
    parts = split_archives(
        spark.createDataFrame(archives, "archive_id string, content binary")
    )
    keys = registry_keys(parts)
    resolved = resolve_references(refs_df, keys)
    got = {(r["archive_id"], r["ref"]): r["part_id"] for r in resolved.collect()}
    assert got == expected

    unfound = {(r["archive_id"], r["url"]) for r in unfound_references(resolved).collect()}
    for idx in range(4):
        archive_id = f"arc_{idx:06d}"
        _, base, _ = _refs_of(idx)
        assert (archive_id, resolve_path("missing.png", base)) in unfound
