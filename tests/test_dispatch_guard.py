"""Regression tests for the jax 0.9.0 separated-consts dispatch corruption.

Bisected failure (reproduced deterministically before the fix): a stale
tracer from an earlier trace leaks into a later trace's closure consts via a
jax-internal cache; pjit separates the consts into prepended runtime args
(jax/_src/pjit.py:555 — whose own TODO says such programs "*must* fall off
the C++ dispatch fast path for correctness") and compiles an N+k-parameter
executable, but a C++ fastpath entry keyed on the N user args is installed
anyway. Every later same-shape call then dies with INVALID_ARGUMENT
"Execution supplied 83 buffers but compiled program expected 86 buffers" and
stays dead until jax.clear_caches(). The integration-level reproduction is
the tests/test_device_postprocess.py module order (axis → rotated →
transient), which failed 3/3 before the guard and passes 3/3 with it.
"""

import jax
import jax.numpy as jnp
import pytest


def test_guard_installed():
    from jax._src import pjit as _pjit

    from surya_tpu.common import runtime

    runtime._patch_fastpath_const_separation()
    assert getattr(_pjit, "_surya_const_guard", False)


def test_separated_const_program_stays_correct_across_shapes():
    """A program whose closure const has quasi-dynamic data (a jax ref) takes
    the separated-consts path; with the guard it must keep executing
    correctly through the exact repeat-after-other-shape pattern that used to
    poison the dispatch."""
    from surya_tpu.common import runtime

    runtime._patch_fastpath_const_separation()
    if not hasattr(jax, "new_ref"):
        pytest.skip("jax.new_ref not available")
    ref = jax.new_ref(jnp.arange(3.0))

    @jax.jit
    def f(x):
        return x + ref[...]

    a = f(jnp.ones(3))
    b = f(jnp.ones((2, 3)))  # second shape compiles a second program
    c = f(jnp.ones(3))  # repeat of the first — the poisoned pattern
    assert jnp.allclose(a, jnp.asarray([1.0, 2.0, 3.0]))
    assert b.shape == (2, 3)
    assert jnp.allclose(a, c)


def test_plain_jit_keeps_fastpath():
    """The guard must not cost clean programs their C++ fastpath entry: the
    second call of a const-free jit dispatches without re-tracing."""
    from surya_tpu.common import runtime

    runtime._patch_fastpath_const_separation()

    @jax.jit
    def g(x):
        return x * 2

    g(jnp.ones(4))
    g(jnp.ones(4))
    assert g._cache_size() == 1


def test_recover_from_dispatch_corruption(monkeypatch):
    from surya_tpu.common import runtime

    cleared = []
    monkeypatch.setattr(jax, "clear_caches", lambda: cleared.append(1))
    assert not runtime.recover_from_dispatch_corruption("INVALID_ARGUMENT: TPU backend error")
    assert cleared == []
    assert runtime.recover_from_dispatch_corruption(
        ValueError("INVALID_ARGUMENT: Execution supplied 83 buffers but compiled program expected 86 buffers")
    )
    assert cleared == [1]
