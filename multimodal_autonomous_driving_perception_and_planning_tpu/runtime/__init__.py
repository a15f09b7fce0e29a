from .loader import NativeFrameSource, build_runtime

__all__ = ["NativeFrameSource", "build_runtime"]
