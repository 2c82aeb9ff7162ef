from . import transforms
from .grid import GridSpec
from .maps import (
    FREE, UNKNOWN, FILLED,
    OccupancyMap, OccupancyComponentMap,
    TaggedObjectOccupancyMap, TaggedObjectOccupancyComponentMap,
    SignedDistanceField,
)
