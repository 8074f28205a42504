"""Join / lookup toolkit (SURVEY §2.4 J1-J9 analogs).

Three physical strategies, chosen by side size — the explicit version of the
reference's joins (all of which are driver-side dict lookups):

- ``broadcast_join``: small side shipped once via ``ray.put``, pandas merge
  per batch inside ``map_batches`` (J2's build-lookup-dict semantics).  No
  shuffle.
- ``broadcast_semi_join`` / ``broadcast_anti_join``: key set broadcast,
  vectorized ``is_in`` mask (J5 subset builder / A8 orphan anti-join).
- large-large: ``Dataset.join`` (Ray's hash-partitioned shuffle join), used
  directly by callers; wrapper kept thin.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def broadcast_join(
    left: ray.data.Dataset,
    right_df: pd.DataFrame,
    on: list[str] | str,
    *,
    how: str = "inner",
) -> ray.data.Dataset:
    """Join a Dataset against a small pandas side (broadcast once)."""
    ref = ray.put(right_df)

    class Joiner:
        def __init__(self, r):
            self.right = ray.get(r) if isinstance(r, ray.ObjectRef) else r

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.right, on=on, how=how)

    return left.map_batches(
        Joiner, fn_constructor_args=(ref,), batch_format="pandas", concurrency=(1, 4)
    )


def _key_set_ref(keys) -> ray.ObjectRef:
    return ray.put(pa.array(sorted(set(keys))))


def broadcast_semi_join(
    left: ray.data.Dataset, key_col: str, keys
) -> ray.data.Dataset:
    """Keep rows whose key is in the broadcast key set."""
    ref = _key_set_ref(keys)

    def f(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        return batch.filter(pc.is_in(batch[key_col], value_set=ks))

    return left.map_batches(f, batch_format="pyarrow")


def broadcast_anti_join(
    left: ray.data.Dataset, key_col: str, keys
) -> ray.data.Dataset:
    """Keep rows whose key is NOT in the broadcast key set (A8 orphan
    cleanup / D7 purge-set semantics)."""
    ref = _key_set_ref(keys)

    def f(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        return batch.filter(
            pc.invert(pc.is_in(batch[key_col], value_set=ks))
        )

    return left.map_batches(f, batch_format="pyarrow")


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | tuple[str, ...],
    *,
    right_on: str | tuple[str, ...] | None = None,
    num_partitions: int = 16,
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Large-large hash-partitioned shuffle join (Ray Dataset.join).

    Note: the right key column is dropped from the output when key names
    differ (Ray semantics)."""
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_t = None
    if right_on is not None:
        r_t = (right_on,) if isinstance(right_on, str) else tuple(right_on)
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on_t,
        right_on=r_t,
    )
