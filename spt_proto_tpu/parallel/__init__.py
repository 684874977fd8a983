from spt_proto_tpu.parallel import mesh, sharding
from spt_proto_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS, make_mesh,
                                         initialize_multihost)
from spt_proto_tpu.parallel.sharding import (batch_sharding, param_shardings,
                                             param_specs, shard_params)

__all__ = ['mesh', 'sharding', 'DATA_AXIS', 'MODEL_AXIS', 'make_mesh',
           'initialize_multihost', 'batch_sharding', 'param_shardings',
           'param_specs', 'shard_params']
