"""snt-download-data — dataset download helper (ref: scripts/download_data.py
+ the fork's data/README.md links).

Downloads the paper's three soccer scenes (or the standard benchmarks)
when network access exists; otherwise prints the URLs and the expected
on-disk layout so datasets can be staged manually.
"""
from __future__ import annotations

import argparse
import urllib.request
import zipfile
from pathlib import Path

# (ref: data/README.md:3-25 — scene descriptions and download links)
SOCCER_DATASETS = {
    "closeup": {
        "url": "https://drive.google.com/drive/folders/1Cyke1VMU1pCd2_2La3cwLzrjPeKqafpt",
        "note": "Scene 1 (Close-up): broadcast rig + 30 Zoom cameras, 4s @ 25 FPS",
    },
    "broadcaststyle": {
        "url": "https://drive.google.com/drive/folders/14tOLRVuyUAEZ2wqKb1Wyt9hfQBzTxXQM",
        "note": "Scene 2 (Broadcast-style): 20 broadcast + 8 global cameras",
    },
    "stadiumwide": {
        "url": "https://drive.google.com/drive/folders/1EnF9T_Fbp85pkjVi-KNJVys_gmLYhmE0",
        "note": "Scene 3 (Stadium-wide): 110 bleacher cameras + 6 close eval",
    },
}
BENCHMARKS = {
    "blender": "https://drive.google.com/uc?id=18JxhpWD-4ZmuFKLzKlAw-w5PpzZxXOcG",
    "dnerf": "https://www.dropbox.com/s/0bf6fl0ye2vz3vr/data.zip",
}


def main(argv=None):
    parser = argparse.ArgumentParser("snt-download-data")
    parser.add_argument(
        "dataset", choices=sorted(SOCCER_DATASETS) + sorted(BENCHMARKS) + ["list"]
    )
    parser.add_argument("--save-dir", type=Path, default=Path("data"))
    args = parser.parse_args(argv)

    if args.dataset == "list":
        for name, info in SOCCER_DATASETS.items():
            print(f"{name:16s} {info['note']}\n{'':16s} {info['url']}")
        for name, url in BENCHMARKS.items():
            print(f"{name:16s} {url}")
        return

    if args.dataset in SOCCER_DATASETS:
        info = SOCCER_DATASETS[args.dataset]
        print(
            f"The soccer scenes are hosted on Google Drive and need a browser "
            f"or gdown:\n  {info['url']}\n"
            f"Stage the archive under {args.save_dir}/{args.dataset}/ so that "
            f"transforms.json and images/<k>x/ sit at the top level."
        )
        return

    url = BENCHMARKS[args.dataset]
    out = args.save_dir / args.dataset
    out.mkdir(parents=True, exist_ok=True)
    archive = out / "data.zip"
    print(f"downloading {url} ...")
    try:
        urllib.request.urlretrieve(url, archive)
    except Exception as e:
        raise SystemExit(
            f"download failed ({e}); fetch {url} manually into {out}/"
        )
    with zipfile.ZipFile(archive) as z:
        z.extractall(out)
    archive.unlink()
    print(f"extracted to {out}")


if __name__ == "__main__":
    main()
