from .gp import GP, GPState, GPTrainConfig  # noqa: F401
