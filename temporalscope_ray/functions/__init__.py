"""Reusable scalar/vector kernels, re-exported for discoverability.

These are the engine's pure functions — everything here is
deterministic, process-independent, and vectorized; the stages compose
them inside ``map_batches`` / ``map_groups``.
"""

from ..codec import decode_image, encode_image, phash64, psnr  # noqa: F401
from ..stages.dedup import hash_strings64, shingle_hashes  # noqa: F401
from ..stages.grouped import entity_segments, hash_key_column  # noqa: F401
from ..stages.graph import _driver_cc as driver_connected_components  # noqa: F401
from ..stages.window_features import (  # noqa: F401
    _decayed_sum as decayed_sum,
    _rolling_distinct_codes as rolling_distinct_codes,
    _seg_rolling as seg_rolling,
    _seg_session_ids as seg_session_ids,
    _seg_shift as seg_shift,
)
from ..synth import hash_u64, hash_uniform  # noqa: F401
