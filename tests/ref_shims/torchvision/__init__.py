"""Import-only shim for torchvision (not installed): the reference imports
``torchvision.transforms`` at module scope but the parity tests never execute
the gif/visualization helpers that use it."""
from . import transforms  # noqa: F401
from . import models  # noqa: F401
