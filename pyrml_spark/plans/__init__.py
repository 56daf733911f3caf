from .salting import salted_join  # noqa: F401
from .tuning import build_session  # noqa: F401
