from .pool import (  # noqa: F401
    DistributedPool,
    EvalPool,
    MultiprocessPool,
    SerialPool,
    make_pool,
)
