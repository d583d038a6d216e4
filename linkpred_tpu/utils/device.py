"""Device introspection: memory budgets derived from queried HBM capacity.

The reference runs "any graph that fits RAM" with zero configuration
(`/root/reference/main.sh:46-62` feeds sk-2005-class graphs to a fixed
binary); the TPU build mirrors that posture by sizing its slot/selection
budgets from the device's reported HBM instead of hard-coded 16 GB-era
constants.  Env vars (`LINKPRED_SLOT_BUDGET`, `LINKPRED_SEG_LANES`) remain
as overrides for A/B runs — see `plan.py` / `scoring.py` for the consumers.
"""
from __future__ import annotations

from functools import lru_cache

__all__ = ["hbm_bytes", "auto_slot_budget", "auto_seg_lanes"]

# v5e per-chip HBM; the fallback when the backend does not report memory
# stats (some PJRT plugins, incl. relay-backed ones, return None/{}).
_DEFAULT_HBM = 16 << 30


@lru_cache(maxsize=None)
def hbm_bytes() -> int:
    """Usable accelerator memory of the default device in bytes.

    Queries ``memory_stats()['bytes_limit']`` (PJRT's allocator cap); falls
    back to 16 GiB when unavailable.  Cached — one backend query per process.
    Never raises: planning happens host-side before any device work and must
    not die on an unreachable relay (the scoring path will surface that).
    """
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit and int(limit) > 0:
            return int(limit)
    except Exception:
        pass
    return _DEFAULT_HBM


def auto_slot_budget() -> int:
    """Packed-slot-stream ceiling: ~55% of HBM at 12 B/slot (three int32
    stream arrays), leaving room for one selection segment + sort workspace.
    Validated point: RMAT-23 LHub (~575M slots ≈ 6.9 GB) runs beside a
    full selection pass on a 16 GB v5e — the 0.55 fraction reproduces the
    hand-tuned LINKPRED_SLOT_BUDGET=7e8 that row used to need."""
    return min(int(hbm_bytes() * 0.55) // 12, (1 << 31) - (1 << 22))


def auto_seg_lanes() -> int:
    """Deferred-selection raw-buffer bound: ~20% of HBM at 12 B/lane
    (single-metric scores + u + v); reproduces the measured-safe 2^28 on a
    16 GB chip and scales with bigger parts."""
    return min(int(hbm_bytes() * 0.20) // 12, 1 << 29)
