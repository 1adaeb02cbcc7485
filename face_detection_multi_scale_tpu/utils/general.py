"""Small shape/size utilities shared across the framework.

Behavioral parity notes reference utils/general.py in the upstream repo
(/root/reference): `make_divisible` (general.py:210), `check_img_size`
(general.py:130-135).
"""

from __future__ import annotations

import math


def make_divisible(x: float, divisor: int) -> int:
    """Round ``x`` up to the nearest multiple of ``divisor``."""
    return int(math.ceil(x / divisor) * divisor)


def check_img_size(img_size: int, s: int = 32) -> int:
    """Round ``img_size`` to the nearest stride multiple (reference
    utils/general.py:130-135 semantics: ceil to multiple of ``s``)."""
    new_size = make_divisible(img_size, int(s))
    return new_size
