"""InteriorNet HD7 scene downloader (samples/interior/download_interior.py).

The reference fetches scene zips from Google Drive via gdown using a CSV
manifest (train 500 / val 60 / test 60 scenes). This environment has no
network egress; the command validates the manifest and prints the fetch
plan, and performs downloads when run somewhere with network access.
"""

from __future__ import annotations

import argparse
import csv
import os
import zipfile


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--list", required=True,
                        help="CSV manifest of (scene_id, drive_id) rows")
    parser.add_argument("--out", default="InteriorNet/HD7")
    parser.add_argument("--subset", default="train",
                        choices=["train", "val", "test"])
    parser.add_argument("--limit", type=int, default=0)
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args(argv)

    with open(args.list) as f:
        rows = [r for r in csv.reader(f) if r]
    if args.limit:
        rows = rows[:args.limit]
    out_dir = os.path.join(args.out, args.subset)
    os.makedirs(out_dir, exist_ok=True)
    print(f"{len(rows)} scenes -> {out_dir}")
    if args.dry_run:
        return
    try:
        import gdown  # noqa: PLC0415
    except ImportError:
        raise SystemExit(
            "gdown is not installed (and this environment has no network "
            "egress). Run this command on a machine with internet access.")
    for scene_id, drive_id in rows:
        zip_path = os.path.join(out_dir, f"{scene_id}.zip")
        gdown.download(id=drive_id, output=zip_path, quiet=False)
        with zipfile.ZipFile(zip_path) as z:
            z.extractall(out_dir)
        os.remove(zip_path)


if __name__ == "__main__":
    main()
