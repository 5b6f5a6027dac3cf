from .mesh import (data_sharding, init_distributed, make_mesh, replicated,
                   shard_batch)

__all__ = ['data_sharding', 'init_distributed', 'make_mesh', 'replicated',
           'shard_batch']
