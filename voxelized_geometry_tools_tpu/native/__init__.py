from .loader import (available, probe_available, get_library,
                     edt_sdf, raycast, filter_grids, hardware_threads)
