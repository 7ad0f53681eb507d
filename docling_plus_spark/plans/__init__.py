"""Pipeline composition, lineage metrics, incremental-epoch execution."""

from .pipeline import (  # noqa: F401
    build_session,
    prepare_pages,
    extract_pipeline,
    lineage_metrics,
)
from .incremental import run_epoch  # noqa: F401
