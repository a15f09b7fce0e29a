from .tracker import tracker_update, confirmed_mask, id_rank

__all__ = ["tracker_update", "confirmed_mask", "id_rank"]
