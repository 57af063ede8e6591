"""Device index state: HBM-resident document arrays, insert/grow/query,
checkpoint/restore, and the call registry bridging host metadata to device
filter masks."""

from .index import (  # noqa: F401
    CorpusIndex,
    DeviceIndexManager,
    DocRow,
    get_index,
    reset_index,
)
