from .transfer import (
    Orchestrator,
    ParquetStore,
    TableTransfer,
    TransferMetrics,
    build_transfer_plans,
    format_report,
)

__all__ = [
    "Orchestrator",
    "ParquetStore",
    "TableTransfer",
    "TransferMetrics",
    "build_transfer_plans",
    "format_report",
]
