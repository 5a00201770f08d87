from .alignment import (  # noqa: F401
    edit_distance, align_expr, nice_alignment, norm_distance,
    ALIGN_RESULT_TYPE,
)
