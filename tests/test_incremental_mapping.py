"""Incremental mapping integration: scan-to-map odometry against a
growing NdtMapAccumulator map (examples/incremental_mapping.py as a
library).

Acceptance: the scan-to-map estimate stays at single-registration error
(no compounding) while the scan-to-scan chain drifts — the map-update
semantics of the reference's caller-held voxel-hash accumulation
(tests/simple_optimization_test.cc:236-280) doing their job end to end.
"""

import importlib.util
import os

_EX = os.path.join(
    os.path.dirname(__file__), "..", "examples", "incremental_mapping.py"
)
_spec = importlib.util.spec_from_file_location("incremental_mapping_ex", _EX)
incremental_mapping = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(incremental_mapping)


def test_scan_to_map_beats_chain():
    e_map, e_chain, f_map, f_chain = incremental_mapping.main(
        n_frames=30, n_scan=900, verbose=True
    )
    # single-registration-level accuracy, no compounding
    assert e_map < 0.08, e_map
    assert f_map < 0.10, f_map
    # the chain drifts well past it by the end
    assert f_map < 0.6 * f_chain, (f_map, f_chain)
