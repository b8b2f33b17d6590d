"""Architecture tracing / module-graph dumps.

The reference wraps modules in wrapt proxies to record a networkx call graph
rendered to PNG/HTML at train start (my_utils/graph_writer/graph_writer.py,
SURVEY.md §2.22).  In a functional framework the module tree is data:
``draw`` tabulates the flax module hierarchy with shapes/param counts and
writes a text + HTML report, and ``param_summary`` reproduces the
reference's per-component param-count prints (stg2_generator.py:139-155,
train.py:370-378).
"""

from __future__ import annotations

import html
import os

import numpy as np
import jax


def param_summary(params, max_depth: int = 2) -> dict:
    """Aggregate parameter counts by top-level module path."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    counts: dict = {}
    total = 0
    for path, leaf in flat:
        keys = [getattr(p, "key", str(p)) for p in path][:max_depth]
        name = "/".join(str(k) for k in keys)
        n = int(np.prod(leaf.shape))
        counts[name] = counts.get(name, 0) + n
        total += n
    counts["TOTAL"] = total
    return counts


def draw(module, out_path: str, *args, method=None, **kwargs) -> str:
    """Write a text (and .html twin) tabulation of a flax module's call graph.

    Args:
      module: flax linen Module.
      out_path: report path ('.txt'; an '.html' twin is written next to it).
      *args/**kwargs: example inputs for tracing, as for ``module.init``.
    """
    table = module.tabulate(
        jax.random.PRNGKey(0),
        *args,
        depth=3,
        console_kwargs={"width": 160},
        **kwargs,
    )
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(table)
    html_path = os.path.splitext(out_path)[0] + ".html"
    with open(html_path, "w") as f:
        f.write(
            "<html><body><pre style='font-family:monospace'>"
            + html.escape(table)
            + "</pre></body></html>"
        )
    return out_path
