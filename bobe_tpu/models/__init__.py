from .classifiers import CLASSIFIER_REGISTRY  # noqa: F401
from .clf_gp import GPwithClassifier  # noqa: F401
from .gp import GP, GPState, GPTrainConfig  # noqa: F401
from . import toys  # noqa: F401
