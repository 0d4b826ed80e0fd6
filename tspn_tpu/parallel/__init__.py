from tspn_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding  # noqa: F401
from tspn_tpu.parallel.train_step import TrainState, create_train_state, make_train_step  # noqa: F401
