from tokensgen_tpu.data.mira import (  # noqa: F401
    MiraDataset,
    VAEMiraDataset,
    VIPMiraDataset,
    WebVideoDataset,
    batch_iterator,
    collate,
)
from tokensgen_tpu.data.transforms import ResolutionControl, resize_for_rectangle_crop  # noqa: F401
from tokensgen_tpu.data.video_io import load_video, read_frames, write_video  # noqa: F401
