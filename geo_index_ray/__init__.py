"""geo_index_ray — Ray-Data-native spatial indexing / joins / tiling engine.

Importing the package tunes one Ray Data executor knob (measured, see
BASELINE.md round 3): ``op_resource_reservation_enabled = False``.  The
streaming executor's per-operator resource reservation starves an
expensive map chain that feeds all-to-all operators in the same execution
— a fused generate→sign→bucket→shuffle pipeline ran 3.6× slower than the
identical work split by a materialize() barrier (99.3 s vs 27.3 s with the
reservation off, 8 CPUs, 5M docs), because the map operator was granted
only a fraction of the cluster while the shuffle it feeds sat idle.  Our
pipelines are map-heavy chains into groupby/sort shuffles — exactly the
shape the reservation punishes — and every stage bounds its own memory
(lean shuffle rows, fixed block sizes), so the reservation's protection
adds nothing here.
"""

from __future__ import annotations


def _tune_data_context() -> None:
    try:
        import ray.data

        ray.data.DataContext.get_current().op_resource_reservation_enabled = False
    except Exception:  # ray absent / too old — the library still imports
        pass


_tune_data_context()
