from lemon_tpu.baselines.clip_sim import run_clip_sim
from lemon_tpu.baselines.zero_shot import run_zero_shot_logits
from lemon_tpu.baselines.discrepancy import run_discrepancy
from lemon_tpu.baselines.deepknn import run_deepknn
