from lemon_tpu.data.labels import LABEL_SETS, num_classes
from lemon_tpu.data.noise import (
    apply_caption_noise,
    caption_noise_by_matching,
    caption_noise_random,
    flip_labels,
    pairflip_matrix,
    symmetric_matrix,
)
from lemon_tpu.data.splits import split_80_10_10, split_80_20, stratified_50_25_25
