from .yolov8 import YOLOv8, YOLOV8_VARIANTS, decode_predictions, make_yolo_detector

__all__ = ["YOLOv8", "YOLOV8_VARIANTS", "decode_predictions", "make_yolo_detector"]
