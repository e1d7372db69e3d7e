from vidil_tpu.utils.logging import MetricLogger, SmoothedValue, setup_for_distributed
from vidil_tpu.utils.dist import (
    init_distributed_mode,
    get_rank,
    get_world_size,
    is_main_process,
    is_dist_avail_and_initialized,
    barrier,
    save_on_master,
)
from vidil_tpu.utils.schedules import (
    cosine_lr_schedule,
    warmup_lr_schedule,
    step_lr_schedule,
)
from vidil_tpu.utils.io import load_json, save_json, shard_range, merge_rank_jsons
from vidil_tpu.utils.seeding import seed_everything
