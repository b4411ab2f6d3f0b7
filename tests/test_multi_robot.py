"""Multi-robot map-merge integration (examples/multi_robot_map_merge.py
driven as a library): two scan-odometry trajectories in different
frames, rendezvous NDT registrations, one joint switchable pose graph.

System-level acceptance for the cross-module composition the reference
never exercises (its pose-graph and registration modules share no test):
frontend registrations become whitened graph edges, the first rendezvous
anchors an unknown robot frame, and a planted false inter-robot match is
switched off at the map-merge level.
"""

import importlib.util
import os

_EX = os.path.join(
    os.path.dirname(__file__), "..", "examples", "multi_robot_map_merge.py"
)
_spec = importlib.util.spec_from_file_location("multi_robot_example", _EX)
multi_robot = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(multi_robot)


def test_map_merge_beats_naive_alignment_and_rejects_false_rendezvous():
    e_b, e_naive, false_switch, switches = multi_robot.main(
        n_frames=16, n_scan=700, keyframe_every=3, verbose=True
    )
    # joint merge must clearly beat placing B by the first rendezvous only
    assert e_b < 0.75 * e_naive, (e_b, e_naive)
    assert e_b < 0.2, e_b
    # the planted false inter-robot match is switched off...
    assert false_switch < 0.15, false_switch
    # ...while the genuine rendezvous + lap-closure edges stay active
    assert (switches[:-1] > 0.6).all(), switches
