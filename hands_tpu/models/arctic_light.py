"""ArcticNet-SF (``arctic_sf_light``): alias of the WildHands architecture.

The reference defines it as a no-change subclass
(``/root/reference/src/models/arctic_light/model.py:4-9``); the behavioural
difference lives entirely in the method config (no KPE, no aux heads,
ARCTIC-only data — see ``hands_tpu.config._METHOD_DEFAULTS``).
"""

from __future__ import annotations

from hands_tpu.config import Config
from hands_tpu.models.hands_light import HandsLightModel


class ArcticSFLightModel(HandsLightModel):
    def __init__(self, cfg: Config):
        super().__init__(cfg)
