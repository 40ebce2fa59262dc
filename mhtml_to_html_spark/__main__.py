"""CLI: convert .mht/.mhtml archives to HTML, Spark-parallel.

Parity with the reference CLI (/root/reference/mod.js):

    python -m mhtml_to_html_spark INPUT... [--output OUT] [--enable-scripts]
        [--fetch-missing-resources] [--version]

- INPUT accepts files and globs (Spark path globs are native);
- with one input and --output, the page goes to that exact path;
- otherwise each page lands next to its archive with ``.html`` swapped
  in (mod.js:63-66);
- a broken archive reports its error and the batch continues
  (mod.js:71-74).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None, fetch=None) -> int:
    """CLI entry; ``fetch`` injects a fetch double for tests (the
    reference CLI tests stub their fetch dependency the same way)."""
    parser = argparse.ArgumentParser(
        prog="mhtml-to-html-spark", description="Convert MHTML archives to HTML (Spark-parallel)."
    )
    from mhtml_to_html_spark import __version__

    parser.add_argument("inputs", nargs="*", help="input files or globs")
    parser.add_argument("--output", help="output file (single input) or directory")
    parser.add_argument("--enable-scripts", action="store_true")
    parser.add_argument(
        "--fetch-missing-resources",
        action="store_true",
        help="fetch resources the archive does not carry (mod.js:17,43-46)",
    )
    parser.add_argument("--version", action="version", version=__version__)
    parser.add_argument("--master", default="local[*]")
    args = parser.parse_args(argv)
    if not args.inputs:
        # the reference prints usage and exits 1 on empty input
        # (mod.js:20-38) rather than argparse's error+exit 2
        parser.print_usage(sys.stderr)
        return 1

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None
    spark = (
        SparkSession.builder.master(args.master)
        .appName("mhtml-to-html-spark")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mhtml_to_html_spark.operators.pages import convert_archives
    from mhtml_to_html_spark.sources.corpus import read_archives

    df = read_archives(spark, args.inputs if len(args.inputs) > 1 else args.inputs[0])

    pages = convert_archives(
        df,
        enable_scripts=args.enable_scripts,
        fetch_missing=args.fetch_missing_resources,
        fetch=fetch,
    ).collect()
    failures = 0
    # --output parity (mod.js:46-48,63-66): honored only for a single
    # non-glob input, and gets ".html" appended when missing; with
    # multiple inputs the reference ignores it — we extend that case to
    # "write into it if it is a directory" and warn otherwise.
    # a single non-glob INPUT can still be a directory (binaryFile
    # reads every archive inside), so the exact-path branch also
    # requires exactly one converted page — otherwise pages would
    # silently overwrite each other in one file
    single_input = len(args.inputs) == 1 and not any(c in args.inputs[0] for c in "*?[{")
    single_output = None
    out_dir_opt = None
    if args.output:
        if single_input and len(pages) == 1 and not os.path.isdir(args.output):
            single_output = args.output
            if not single_output.endswith(".html"):
                single_output += ".html"
        elif os.path.isdir(args.output):
            out_dir_opt = args.output
        else:
            print(
                f"--output {args.output} ignored: multiple pages and not a directory",
                file=sys.stderr,
            )
    for row in pages:
        src_path = row["archive_id"].replace("file:", "")
        if row["error"] is not None:
            print(f"{src_path}: {row['error']}", file=sys.stderr)
            failures += 1
            continue
        if single_output:
            out_path = single_output
        else:
            base = os.path.splitext(os.path.basename(src_path))[0] + ".html"
            out_dir = out_dir_opt if out_dir_opt else os.path.dirname(src_path)
            out_path = os.path.join(out_dir, base)
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w", encoding="utf-8") as f:
            f.write(row["data"])
        print(json.dumps({"input": src_path, "output": out_path, "title": row["title"]}))
    if not preexisting:  # embedded callers (tests) keep their session
        spark.stop()
    return 1 if failures == len(pages) else 0


if __name__ == "__main__":
    sys.exit(main())
