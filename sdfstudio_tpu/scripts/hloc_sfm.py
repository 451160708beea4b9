"""hloc (hierarchical localization) SfM backend for sst-process-data.

Functional spec: reference nerfstudio/process_data/hloc_utils.py:46-119 and
scripts/process_data.py:733 (`--sfm-tool hloc`): learned features
(superpoint/r2d2/disk/...) + learned matching (superglue/adalam/...) as an
alternative to COLMAP's SIFT, producing the same sparse/0 model layout that
`colmap_to_transforms` consumes.

hloc is a torch-GPU toolbox with downloadable model weights that a
zero-egress deployment cannot install, so the import is gated: when the
module is absent the caller gets an actionable error instead of a crash.
The adapter is written against hloc's public pipeline API
(extract_features / pairs_from_* / match_features / reconstruction) and is
exercised hermetically in tests/test_process_data.py with an injected fake
module.
"""
from __future__ import annotations

import sys
from pathlib import Path

FEATURE_TYPES = (
    "sift", "superpoint_aachen", "superpoint_max", "superpoint_inloc",
    "r2d2", "d2net-ss", "sosnet", "disk",
)
MATCHER_TYPES = (
    "superglue", "superglue-fast", "NN-superpoint", "NN-ratio",
    "NN-mutual", "adalam",
)


def hloc_available() -> bool:
    try:
        import hloc  # noqa: F401
    except ImportError:
        return False
    return True


def run_hloc(
    image_dir: Path,
    out_dir: Path,
    camera_model: str = "OPENCV",
    matching_method: str = "exhaustive",
    feature_type: str = "superpoint_aachen",
    matcher_type: str = "superglue",
    num_matched: int = 50,
    verbose: bool = False,
) -> Path:
    """Drive the hloc pipeline: features -> pairs -> matches -> pycolmap
    reconstruction. Returns the sparse model dir (``out_dir/sparse/0``),
    the same layout ``run_colmap`` produces so downstream conversion is
    backend-agnostic.
    """
    try:
        from hloc import (
            extract_features,
            match_features,
            pairs_from_exhaustive,
            pairs_from_retrieval,
            reconstruction,
        )
    except ImportError:
        print(
            "[hloc] the hloc toolbox is not installed. Install "
            "https://github.com/cvg/Hierarchical-Localization (needs torch "
            "with GPU + model weights) or use --sfm-tool colmap.",
            file=sys.stderr,
        )
        sys.exit(1)

    image_dir = Path(image_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    sfm_dir = out_dir / "sparse" / "0"
    pairs_path = out_dir / "pairs.txt"
    features_path = out_dir / "features.h5"
    matches_path = out_dir / "matches.h5"

    references = sorted(
        p.relative_to(image_dir).as_posix()
        for p in image_dir.iterdir()
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )
    if not references:
        raise FileNotFoundError(f"no images under {image_dir}")

    feature_conf = dict(extract_features.confs[feature_type])
    matcher_conf = dict(match_features.confs[matcher_type])
    extract_features.main(
        feature_conf, image_dir, image_list=references, feature_path=features_path
    )

    if matching_method == "exhaustive" or len(references) < num_matched:
        pairs_from_exhaustive.main(pairs_path, image_list=references)
    else:
        # retrieval-based pairing (the reference's vocab_tree analog):
        # global NetVLAD descriptors pick each image's num_matched neighbours
        retrieval_conf = dict(extract_features.confs["netvlad"])
        retrieval_path = extract_features.main(retrieval_conf, image_dir, out_dir)
        pairs_from_retrieval.main(
            retrieval_path, pairs_path, num_matched=min(num_matched, len(references))
        )

    match_features.main(
        matcher_conf, pairs_path, features=features_path, matches=matches_path
    )

    # pycolmap mapping over the hloc features/matches; camera_mode SINGLE
    # mirrors run_colmap's --ImageReader.single_camera 1
    kwargs = {}
    try:
        import pycolmap

        kwargs["camera_mode"] = pycolmap.CameraMode.SINGLE
    except ImportError:
        pass
    reconstruction.main(
        sfm_dir,
        image_dir,
        pairs_path,
        features_path,
        matches_path,
        image_list=references,
        **kwargs,
    )
    if verbose:
        print(f"[hloc] sparse model -> {sfm_dir}", flush=True)
    return sfm_dir
