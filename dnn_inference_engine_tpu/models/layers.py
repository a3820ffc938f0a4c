"""Layer IR: the model-graph vocabulary (reference L3; SURVEY.md M1/M3).

The reference defines YOLOv2-tiny as an explicit sequential layer list.
We keep that shape — a model is a tuple of layer configs — but the
vocabulary also covers darknet ``route`` (concat), ``shortcut`` (residual
add) and ``upsample`` so the same machinery expresses YOLOv3-tiny and
ResNet-18 (SURVEY.md M3, BASELINE config 3).

Layer references (Route.layers / Shortcut.frm) use absolute layer indices
into the model's layer list; the special index -1 style relative refs of
darknet are resolved at model-definition time.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class Conv:
    out_ch: int
    ksize: int = 3
    stride: int = 1
    act: str = "leaky"       # leaky | relu | linear
    use_bn: bool = True      # BN folded into (w, b) at load time
    padding: str = "SAME"


@dataclasses.dataclass(frozen=True)
class MaxPool:
    size: int = 2
    stride: int = 2          # stride=1 => darknet 'same' pool (SURVEY.md hard part 3)
    padding: str = "VALID"   # 'SAME' for the ResNet stem pool


@dataclasses.dataclass(frozen=True)
class Route:
    """Concatenate outputs of earlier layers along channels (darknet route)."""
    layers: Tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class Shortcut:
    """Residual add with an earlier layer's output (darknet shortcut)."""
    frm: int
    act: str = "linear"


@dataclasses.dataclass(frozen=True)
class Upsample:
    stride: int = 2


@dataclasses.dataclass(frozen=True)
class GlobalAvgPool:
    pass


@dataclasses.dataclass(frozen=True)
class Dense:
    out: int
    act: str = "linear"
