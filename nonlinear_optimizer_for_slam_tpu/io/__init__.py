"""Dataset IO: standard pose-graph file formats."""

from .g2o import (  # noqa: F401
    G2oEdge,
    G2oGraph,
    load_pose_graph,
    read_g2o,
    save_pose_graph,
    write_g2o,
)
