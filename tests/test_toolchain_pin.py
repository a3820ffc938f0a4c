"""Toolchain pin guard (round-4 verdict weak #4 / task 6).

The front-end floor claim (docs/FRONTEND_FLOORS.md) and every pinned
per-layer strategy (docs/SWEEP_*.json -> runtime/plan.py
_BATCH_STRATEGIES) were measured under a specific jax/jaxlib/libtpu
pin; the floors exist because of empirically probed Mosaic limits
(int8 vector max does not legalize, DMA slices need tile-aligned
offsets) that any toolchain bump can change. Without this guard, a
version bump would silently strand stale floor claims and
possibly-stale strategy pins.

This test FAILS on drift — the remediation (re-run docs/run_sweeps.sh,
re-probe tools/probe_dma_rules.py, refresh docs/FRONTEND_FLOORS.md,
update docs/TOOLCHAIN.json) is in the failure message, so the failure
is actionable, not noise.
"""

import json
import os

_TOOLCHAIN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "TOOLCHAIN.json")


def _installed_versions() -> dict:
    import jax
    import jaxlib
    out = {"jax": jax.__version__, "jaxlib": jaxlib.__version__}
    try:
        import importlib.metadata as md
        out["libtpu"] = md.version("libtpu")
    except Exception:        # noqa: BLE001 — CPU-only environments
        out["libtpu"] = None
    return out


def test_toolchain_matches_pin():
    with open(_TOOLCHAIN) as f:
        pin = json.load(f)
    cur = _installed_versions()
    drift = {k: (pin[k], cur[k]) for k in ("jax", "jaxlib", "libtpu")
             if cur[k] is not None and cur[k] != pin[k]}
    assert not drift, (
        f"toolchain drift vs docs/TOOLCHAIN.json: {drift}. The "
        "front-end floor record (docs/FRONTEND_FLOORS.md) and the "
        "pinned sweep strategies were measured under the pinned "
        "versions and may be stale. Re-run docs/run_sweeps.sh (full, "
        "no --quick), re-probe tools/probe_dma_rules.py, refresh "
        "docs/FRONTEND_FLOORS.md if any Mosaic rule changed, then "
        "update docs/TOOLCHAIN.json to the new versions.")


def test_pinned_artifacts_exist():
    """Every artifact the pin vouches for must actually be in-tree."""
    with open(_TOOLCHAIN) as f:
        pin = json.load(f)
    root = os.path.dirname(os.path.dirname(_TOOLCHAIN))
    missing = [p for p in pin["pinned_artifacts"]
               if not os.path.exists(os.path.join(root, p))]
    assert not missing, missing
