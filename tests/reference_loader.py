"""Import the ACTUAL reference torch models (/root/reference/src/networks).

Inserts the test-only timm/monai stubs (tests/refstubs) plus the reference src
dir into sys.path, then imports the reference ``networks`` package. Used by the
whole-model parity gate: the independence of this path from our converter's key
map is the whole point (the reference code itself generates the state_dict and
the expected logits).
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_STUBS = os.path.join(_HERE, "refstubs")
_REF_SRC = "/root/reference/src"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(_REF_SRC, "networks"))


def load_reference():
    """Returns the reference ``networks`` package (CENet, CENetOrg)."""
    for p in (_STUBS, _REF_SRC):
        if p not in sys.path:
            sys.path.insert(0, p)
    import networks  # the reference package

    return networks
