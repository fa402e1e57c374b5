from muchsalsa_tpu.parallel.mesh import make_mesh
from muchsalsa_tpu.parallel.sharded import sharded_chain_dp

__all__ = ["make_mesh", "sharded_chain_dp"]
