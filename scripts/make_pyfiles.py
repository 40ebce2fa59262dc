"""Build dist/mhtml_to_html_spark.zip for spark-submit --py-files."""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "mhtml_to_html_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "mhtml_to_html_spark")
        for root, _dirs, files in os.walk(pkg):
            for name in files:
                if name.endswith(".py"):
                    path = os.path.join(root, name)
                    zf.write(path, os.path.relpath(path, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
