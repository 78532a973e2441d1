from .compare import check_error, compare_subgrids, compare_visibilities
from .costs import bytes_gridder, flops_gridder, workload_costs
from .report import device_name, report, report_csv
from .timing import TimingResult, time_kernel

__all__ = [
    "check_error",
    "compare_subgrids",
    "compare_visibilities",
    "flops_gridder",
    "bytes_gridder",
    "workload_costs",
    "report",
    "report_csv",
    "device_name",
    "time_kernel",
    "TimingResult",
]
