from .assignment import (  # noqa: F401
    Assignment,
    uniform_assignment,
    random_assignment,
    buckets_from_assignment,
)
from .assigner import Assigner, AssignerConfig  # noqa: F401
from .profile import fit_cost_model, profile_cost_model  # noqa: F401
