from tspn_tpu.models.tspn import TSPNModel, build_model  # noqa: F401
