from .production import (FrameData, FrameIntrinsic, RGBDSequence,
                         ICLNUIMSequence, ScanNetSequence, SyntheticSequence,
                         open_sequence)

__all__ = ["FrameData", "FrameIntrinsic", "RGBDSequence", "ICLNUIMSequence",
           "ScanNetSequence", "SyntheticSequence", "open_sequence"]
