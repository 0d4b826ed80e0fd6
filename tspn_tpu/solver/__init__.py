from tspn_tpu.solver.optim import (  # noqa: F401
    ReduceOnPlateauState,
    build_optimizer,
    warmup_multistep_schedule,
)
