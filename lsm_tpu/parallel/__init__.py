from .sharding import make_mesh, domain_spec, shard_field, constrain
from .halo import HaloField, halo_pad_axis, make_sharded_step
from .evolve import ShardedNarrowBandField, make_sharded_evolve, sharded_band_mask
