#!/usr/bin/env python
"""CLI demo entry point.

Run with:
  python demo.py --synthetic [--frames N] [--save-video] [--no-display]
  python demo.py --video path/to/video.mp4 [...]
  python demo.py --test            # six-component smoke suite
"""

from multimodal_autonomous_driving_perception_and_planning_tpu.apps.demo import main

if __name__ == "__main__":
    main()
