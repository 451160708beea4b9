"""sst-download-data: dataset download CLI.

Functional spec: reference scripts/downloads/download_data.py:23-369
(subcommands blender / sdfstudio / friends / dnerf / phototourism /
mipnerf360 / nerfstudio captures). Implemented with stdlib urllib instead of
gdown/wget; Google-Drive-hosted archives use the uc?export=download endpoint
with the confirm-token dance.
"""
from __future__ import annotations

import argparse
import shutil
import sys
import tarfile
import urllib.request
import zipfile
from pathlib import Path

# reference download_data.py:240-251
SDFSTUDIO_DOWNLOADS = {
    "sdfstudio-demo-data": "https://s3.eu-central-1.amazonaws.com/avg-projects/monosdf/data/sdfstudio-demo-data.tar",
    "dtu": "https://s3.eu-central-1.amazonaws.com/avg-projects/monosdf/data/DTU.tar",
    "replica": "https://s3.eu-central-1.amazonaws.com/avg-projects/monosdf/data/Replica.tar",
    "scannet": "https://s3.eu-central-1.amazonaws.com/avg-projects/monosdf/data/scannet.tar",
    "tanks-and-temple": "https://s3.eu-central-1.amazonaws.com/avg-projects/monosdf/data/tnt_advanced.tar",
    "tanks-and-temple-highres": "https://s3.eu-central-1.amazonaws.com/avg-projects/monosdf/data/highresTNT.tar",
    "heritage": "https://s3.eu-central-1.amazonaws.com/avg-projects/monosdf/data/Heritage-Recon.tar",
    "neural-rgbd-data": "http://kaldir.vc.in.tum.de/neural_rgbd/neural_rgbd_data.zip",
}

# reference download_data.py:44,69 (google drive zip archives)
GDRIVE_FILE_IDS = {
    "blender": "18JxhpWD-4ZmuFKLzKlAw-w5PpzZxXOcG",
    "friends": "1sgKr0ZO7BQC0FYinAnRSxobIWNucAST5",
}

# reference download_data.py:183-189
PHOTOTOURISM_DOWNLOADS = {
    "brandenburg-gate": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/brandenburg_gate.tar.gz",
    "buckingham-palace": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/buckingham_palace.tar.gz",
    "colosseum-exterior": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/colosseum_exterior.tar.gz",
    "grand-palace-brussels": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/grand_place_brussels.tar.gz",
    "notre-dame-front-facade": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/notre_dame_front_facade.tar.gz",
    "palace-of-westminster": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/palace_of_westminster.tar.gz",
    "pantheon-exterior": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/pantheon_exterior.tar.gz",
    "taj-mahal": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/taj_mahal.tar.gz",
    "temple-nara-japan": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/temple_nara_japan.tar.gz",
    "trevi-fountain": "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/trevi_fountain.tar.gz",
}

DNERF_URL = "https://www.dropbox.com/s/raw/0bf6fl0ye2vz3vr/data.zip"
MIPNERF360_URL = "http://storage.googleapis.com/gresearch/refraw360/360_v2.zip"


def _fetch(url: str, dest: Path, chunk: int = 1 << 20) -> None:
    dest.parent.mkdir(parents=True, exist_ok=True)
    req = urllib.request.Request(url, headers={"User-Agent": "sdfstudio-tpu"})
    with urllib.request.urlopen(req) as r, open(dest, "wb") as f:
        total = int(r.headers.get("Content-Length") or 0)
        done = 0
        while True:
            buf = r.read(chunk)
            if not buf:
                break
            f.write(buf)
            done += len(buf)
            if total:
                print(f"\r{dest.name}: {done / 1e6:.1f}/{total / 1e6:.1f} MB", end="", file=sys.stderr)
        print(file=sys.stderr)


def _fetch_gdrive(file_id: str, dest: Path) -> None:
    """Google Drive direct download (confirm-token dance for large files)."""
    base = "https://drive.google.com/uc?export=download"
    url = f"{base}&id={file_id}&confirm=t"
    _fetch(url, dest)


def _extract(archive: Path, out_dir: Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    name = archive.name
    if name.endswith(".zip"):
        with zipfile.ZipFile(archive) as z:
            z.extractall(out_dir)
    elif name.endswith((".tar", ".tar.gz", ".tgz")):
        with tarfile.open(archive) as t:
            t.extractall(out_dir)
    else:
        raise ValueError(f"unknown archive type: {name}")
    archive.unlink()


def download_blender(save_dir: Path, **_) -> None:
    """reference download_data.py:37-60"""
    arc = save_dir / "blender_data.zip"
    _fetch_gdrive(GDRIVE_FILE_IDS["blender"], arc)
    _extract(arc, save_dir)
    src = save_dir / "nerf_synthetic"
    if src.exists():
        dst = save_dir / "blender"
        if dst.exists():
            shutil.rmtree(dst)
        src.rename(dst)


def download_sdfstudio(save_dir: Path, capture: str = "sdfstudio-demo-data", **_) -> None:
    """reference download_data.py:255-283"""
    names = list(SDFSTUDIO_DOWNLOADS) if capture == "all" else [capture]
    for name in names:
        url = SDFSTUDIO_DOWNLOADS[name]
        arc = save_dir / Path(url).name
        _fetch(url, arc)
        _extract(arc, save_dir)


def download_friends(save_dir: Path, **_) -> None:
    """reference download_data.py:63-78"""
    arc = save_dir / "friends.zip"
    _fetch_gdrive(GDRIVE_FILE_IDS["friends"], arc)
    _extract(arc, save_dir)


def download_dnerf(save_dir: Path, **_) -> None:
    """reference download_data.py:160-178"""
    arc = save_dir / "dnerf_data.zip"
    _fetch(DNERF_URL, arc)
    _extract(arc, save_dir / "dnerf")


def download_phototourism(save_dir: Path, capture: str = "trevi-fountain", **_) -> None:
    """reference download_data.py:181-230"""
    names = list(PHOTOTOURISM_DOWNLOADS) if capture == "all" else [capture]
    for name in names:
        url = PHOTOTOURISM_DOWNLOADS[name]
        arc = save_dir / "phototourism" / Path(url).name
        _fetch(url, arc)
        _extract(arc, save_dir / "phototourism")


def download_mipnerf360(save_dir: Path, **_) -> None:
    """reference download_data.py:233-237"""
    arc = save_dir / "mipnerf360.zip"
    _fetch(MIPNERF360_URL, arc)
    _extract(arc, save_dir / "mipnerf360")


COMMANDS = {
    "blender": download_blender,
    "sdfstudio": download_sdfstudio,
    "friends": download_friends,
    "dnerf": download_dnerf,
    "phototourism": download_phototourism,
    "mipnerf360": download_mipnerf360,
}


def entrypoint():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", choices=sorted(COMMANDS))
    p.add_argument("--save-dir", type=Path, default=Path("data"))
    p.add_argument(
        "--capture",
        type=str,
        default=None,
        help="capture name for sdfstudio/phototourism (or 'all'); "
        f"sdfstudio: {sorted(SDFSTUDIO_DOWNLOADS)}; "
        f"phototourism: {sorted(PHOTOTOURISM_DOWNLOADS)}",
    )
    a = p.parse_args()
    kwargs = {}
    if a.capture is not None:
        kwargs["capture"] = a.capture
    COMMANDS[a.dataset](a.save_dir, **kwargs)


if __name__ == "__main__":
    entrypoint()
