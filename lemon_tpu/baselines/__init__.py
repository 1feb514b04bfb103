from lemon_tpu.baselines.clip_sim import run_clip_sim
from lemon_tpu.baselines.zero_shot import run_zero_shot_logits
from lemon_tpu.baselines.discrepancy import run_discrepancy
from lemon_tpu.baselines.deepknn import run_deepknn
from lemon_tpu.baselines.capfilt import run_capfilt
from lemon_tpu.baselines.training_dependent import run_training_dependent
