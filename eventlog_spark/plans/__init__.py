from .audit import (  # noqa: F401
    count_nodes,
    formatted_plan,
    has_node,
    pushed_filters,
    read_schemas,
)
