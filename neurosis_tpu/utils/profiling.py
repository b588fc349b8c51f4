"""Module-name spans for profiler traces (RecordModuleNames parity).

Reference: trainer/profile/profiler.py:236-299 attaches "[mod]<name>: <Class>"
record_function spans via torch forward hooks with a max_depth limit. The TPU
analog: Flax already wraps every bound module call in a `jax.named_scope` (the
module path appears in each HLO op's metadata / the trace's `tf_op` field);
`record_module_names` additionally attaches the reference-style depth-limited
"[mod]path(Class)" spans via `nn.intercept_methods`, so traces carry CLASS
names (ResBlock, SpatialTransformer, CLIPTextTransformer, ...) and the
profiler summary can aggregate device time per module.

Scopes are trace-time constructs: enter the context BEFORE the step function
is jitted (the Trainer does this automatically when a NeurosisProfiler
callback has record_module_names=True).
"""

from __future__ import annotations

import contextlib

import jax
from flax import linen as nn


def _scope_interceptor(max_depth: int):
    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__" or mod is None:
            return next_fun(*args, **kwargs)
        try:
            path = mod.path
        except Exception:
            path = ()
        if max_depth > 0 and len(path) > max_depth:
            return next_fun(*args, **kwargs)
        # torch-style dotted path; "(Class)" not ":Class" and no "/" inside
        # the label — the trace's tf_op field treats ":" as the op-type
        # separator and "/" as the scope separator, either would split the span
        label = ".".join(map(str, path)) or (mod.name or type(mod).__name__)
        with jax.named_scope(f"[mod]{label}({type(mod).__name__})"):
            return next_fun(*args, **kwargs)

    return interceptor


@contextlib.contextmanager
def record_module_names(max_depth: int = -1):
    """Attach "[mod]path:Class" named scopes around every Flax module call
    traced inside the context (depth-limited like the reference's
    RecordModuleNames(max_depth=...)). Metadata-only: compiled code is
    unchanged; HLO op names gain the module spans."""
    with nn.intercept_methods(_scope_interceptor(max_depth)):
        yield
