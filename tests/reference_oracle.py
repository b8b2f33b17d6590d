"""Shared helper: import the reference torch model zoo as a test oracle.

The reference layer code is in-tree and CPU-importable
(/root/reference/model/*.py) once its eval-only conveniences are stubbed:
the graph_writer tracer needs pyvis, and stg2_generator imports the absent
photometric_optimization submodule at module level (used only by
FlameTextureSpace.__init__, which the parity tests bypass via ``__new__``).
The reference tree is imported read-only purely as an oracle.
"""

import sys
import types

REF = "/root/reference"


def import_reference():
    """Returns (stg2_generator, stg2_discriminator) reference modules."""
    if REF not in sys.path:
        sys.path.insert(0, REF)

    class _NoopSpace:
        def __init__(self, *a, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    gw = types.ModuleType("my_utils.graph_writer.graph_writer")
    gw.ModuleSpace = _NoopSpace
    gw.CallWrapper = lambda m, **k: m  # transparent: keeps state_dict names
    pkg = types.ModuleType("my_utils.graph_writer")
    pkg.graph_writer = gw
    sys.modules.setdefault("my_utils.graph_writer", pkg)
    sys.modules.setdefault("my_utils.graph_writer.graph_writer", gw)

    po = types.ModuleType("my_utils.photometric_optimization")
    for sub in ("models", "gif_helper", "util"):
        m = types.ModuleType(f"my_utils.photometric_optimization.{sub}")
        if sub == "models":
            m.FLAME = None
        sys.modules.setdefault(f"my_utils.photometric_optimization.{sub}", m)
        setattr(po, sub, m)
    sys.modules.setdefault("my_utils.photometric_optimization", po)

    import model.stg2_generator as ref_gen  # noqa: E402
    import model.stg2_discriminator as ref_disc  # noqa: E402

    return ref_gen, ref_disc
