from flamo_tpu.parallel.mesh import (
    get_mesh, get_mesh_2d, shard_spectrum, replicate, bin_sharded_forward,
)
from flamo_tpu.parallel.dp import make_dp_train_step, shard_batch
from flamo_tpu.parallel.ensemble import MultiSeedEnsemble
from flamo_tpu.parallel.fused import (
    bins_sharded_fused_loss, make_bins_sharded_fused_step,
    bins_sharded_attenuated_loss, make_bins_sharded_attenuated_step,
    make_bins_sharded_aa_taps_step, make_bins_sharded_evs_step,
    seed_bins_sharded_fused_loss, make_seed_bins_sharded_fused_step,
    masked_sharded_sfdn_loss, make_masked_sharded_sfdn_step,
)
