"""sst-render: render a camera-path video from a trained checkpoint.

Functional spec: reference scripts/render.py:38-160 (interpolated / spiral /
viewer-JSON camera paths, chunked rendering, video/image output).
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(
    load_config: Path,
    output_path: Path,
    traj: str = "interpolate",  # interpolate | spiral | filename
    camera_path_filename: Path = None,
    rendered_output_names=("rgb",),
    num_frames: int = 30,
    fps: int = 12,
):
    from sdfstudio_tpu.cameras import camera_paths
    from sdfstudio_tpu.engine.setup import eval_setup
    from sdfstudio_tpu.utils.colormaps import apply_depth_colormap

    config, trainer = eval_setup(load_config)
    cams = trainer.datamanager.train_cameras
    if traj == "interpolate":
        path = camera_paths.get_interpolated_camera_path(cams, steps=num_frames)
    elif traj == "spiral":
        path = camera_paths.get_spiral_path(cams, steps=num_frames)
    elif traj == "filename":
        data = json.loads(Path(camera_path_filename).read_text())
        path = camera_paths.get_path_from_json(data)
    else:
        raise ValueError(f"unknown trajectory {traj}")

    frames = []
    h = int(np.asarray(path.height)[0])
    w = int(np.asarray(path.width)[0])
    for i in range(path.num_cameras):
        bundle = path.generate_image_rays(i)
        chunk = trainer.model.config.eval_num_rays_per_chunk
        import jax
        import jax.numpy as jnp

        outs = []
        n = bundle.origins.shape[0]
        n_pad = ((n + chunk - 1) // chunk) * chunk
        pad = n_pad - n
        bundle = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n and pad
            else x,
            bundle,
        )
        step = trainer.state.step.astype(jnp.float32)
        for c in range(n_pad // chunk):
            sl = jax.tree_util.tree_map(
                lambda x: x[c * chunk : (c + 1) * chunk]
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n_pad
                else x,
                bundle,
            )
            outs.append(trainer._render_chunk(trainer.state.params, sl, step, trainer.state.model_state))
        merged = jax.tree_util.tree_map(lambda *xs: np.concatenate([np.asarray(x) for x in xs]), *outs)
        row = []
        for name in rendered_output_names:
            img = merged[name][:n].reshape(h, w, -1)
            if name == "depth":
                img = apply_depth_colormap(img)
            elif img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            row.append(np.clip(img, 0, 1))
        frames.append(np.concatenate(row, axis=1))
        print(f"rendered frame {i + 1}/{path.num_cameras}", flush=True)

    output_path.parent.mkdir(parents=True, exist_ok=True)
    arr = (np.stack(frames) * 255).astype(np.uint8)
    import imageio.v2 as imageio

    if output_path.suffix.lower() in (".mp4", ".gif"):
        try:
            if output_path.suffix.lower() == ".gif":
                # imageio's pure-python GIF writer takes per-frame duration
                imageio.mimwrite(output_path, arr, duration=1000.0 / fps, loop=0)
            else:
                imageio.mimwrite(output_path, arr, fps=fps)
        except Exception as e:  # no ffmpeg in hermetic envs: fall back to GIF
            fallback = output_path.with_suffix(".gif")
            print(f"[render] {output_path.suffix} writer unavailable ({e}); writing {fallback}")
            imageio.mimwrite(fallback, arr, duration=1000.0 / fps, loop=0)
            output_path = fallback
    else:
        output_path.mkdir(parents=True, exist_ok=True)
        for i, f in enumerate(arr):
            imageio.imwrite(output_path / f"{i:05d}.png", f)
    print(f"wrote {output_path}")


def entrypoint():
    from sdfstudio_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honor SST_JAX_PLATFORM (sitecustomize pins axon)

    p = argparse.ArgumentParser()
    p.add_argument("--load-config", type=Path, required=True)
    p.add_argument("--output-path", type=Path, default=Path("renders/output.mp4"))
    p.add_argument("--traj", default="interpolate", choices=["interpolate", "spiral", "filename"])
    p.add_argument("--camera-path-filename", type=Path, default=None)
    p.add_argument("--rendered-output-names", nargs="+", default=["rgb"])
    p.add_argument("--num-frames", type=int, default=30)
    p.add_argument("--fps", type=int, default=12)
    a = p.parse_args()
    main(a.load_config, a.output_path, a.traj, a.camera_path_filename,
         tuple(a.rendered_output_names), a.num_frames, a.fps)


if __name__ == "__main__":
    entrypoint()
