#!/usr/bin/env python
"""Interactive dashboard entry point.

With streamlit installed:   streamlit run app.py
Without streamlit:          python app.py --backend web [--synthetic]
                            (stdlib HTTP dashboard on --port, default 8700)
"""

import argparse
import sys


def main():
    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.platform import (
        apply_platform_env,
    )

    apply_platform_env()
    parser = argparse.ArgumentParser(description="AV pipeline dashboard")
    parser.add_argument("--backend", choices=["streamlit", "web", "serve"],
                        default=None)
    parser.add_argument("--video", type=str, default=None)
    parser.add_argument("--frames", type=int, default=120)
    parser.add_argument("--port", type=int, default=8700)
    parser.add_argument(
        "--host",
        type=str,
        default="127.0.0.1",
        help="bind address for the web backend (default loopback; "
        "0.0.0.0 exposes the dashboard deliberately)",
    )
    args, extra = parser.parse_known_args()

    backend = args.backend
    if backend is None:
        try:
            import streamlit  # noqa: F401

            backend = "streamlit"
        except ImportError:
            backend = "web"

    if backend == "streamlit":
        try:
            import streamlit.runtime  # noqa: F401

            from multimodal_autonomous_driving_perception_and_planning_tpu.apps.dashboard import (
                main as st_main,
            )

            st_main()
            return
        except ImportError:
            print("streamlit is not installed; falling back to the web backend.")
    if backend == "serve":
        # Headless inference tier: AOT artifact + npz chunk API (apps/serve.py).
        from multimodal_autonomous_driving_perception_and_planning_tpu.apps.serve import (
            main as serve_main,
        )

        # Unrecognized flags (--batch, --chunk, ...) pass through to serve;
        # --host is consumed by this parser, so forward it explicitly.
        serve_main(["--port", str(args.port), "--host", args.host] + extra)
        return
    from multimodal_autonomous_driving_perception_and_planning_tpu.apps.webview import serve

    serve(
        port=args.port,
        num_frames=args.frames,
        video_path=args.video,
        host=args.host,
    )


if __name__ == "__main__":
    main()
else:
    # `streamlit run app.py` imports this module and executes top level.
    try:
        import streamlit.runtime.scriptrunner as _sr

        if _sr.get_script_run_ctx() is not None:
            from multimodal_autonomous_driving_perception_and_planning_tpu.apps.dashboard import (
                main as _st_main,
            )

            _st_main()
    except ImportError:
        pass
