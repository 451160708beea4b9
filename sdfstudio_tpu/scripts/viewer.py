"""sst-viewer: browse a TRAINED checkpoint interactively (no training).

The reference splits this across `ns-bridge-server` (the ZMQ/WebSocket
bridge process, nerfstudio/viewer/server/server.py:89) plus a training
process in viewer mode; here the viewer is a self-contained HTTP server
rendering through the live jitted eval path, so a view-only session is
just: rebuild the pipeline from the run's config.yml, restore the latest
checkpoint, and serve renders until ctrl+c.

Usage:
    sst-viewer --load-config outputs/<exp>/<method>/<ts>/config.yml \
        [--port 7007]
"""
from __future__ import annotations

import argparse
from pathlib import Path


def entrypoint(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--load-config", type=Path, required=True,
                    help="config.yml of the trained run")
    ap.add_argument("--port", type=int, default=7007)
    ap.add_argument("--smoke", action="store_true",
                    help="render one frame through the viewer path and exit "
                    "(CI: proves checkpoint -> viewer render without serving)")
    args = ap.parse_args(argv)

    from sdfstudio_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honor SST_JAX_PLATFORM (sitecustomize pins axon)

    from sdfstudio_tpu.engine.setup import eval_setup
    from sdfstudio_tpu.viewer.server import ViewerState, setup_viewer

    _, trainer = eval_setup(args.load_config)
    if args.smoke:
        img = ViewerState(trainer)._render(0.5, 0.3, 2.5, 32, 32)
        assert img.shape == (32, 32, 3)
        print(f"viewer smoke render ok: {img.shape}", flush=True)
        return
    viewer = setup_viewer(trainer, port=args.port)
    print("view-only session — ctrl+c to exit", flush=True)
    try:
        viewer.serve_idle()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    entrypoint()
