"""`fastforward_tpu.nn.functional` — alias of the quantized op namespace.

API parity with the reference's `fastforward.nn.functional`
(`src/fastforward/_gen/operators.py`): the same operators are importable
from both `fastforward_tpu.ops` and here.
"""

from fastforward_tpu.ops import *  # noqa: F401,F403
from fastforward_tpu.ops import (  # noqa: F401
    OPERATOR_TABLE,
    get_operator,
    scaled_dot_product_attention,
    sdpa_upcast,
)
