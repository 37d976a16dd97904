"""Source/sink connectors.

- reference_snapshot: read/write the reference engine's whole-file JSON
  snapshot format (vectordb.cpp:158-218) — the migration path for a user
  switching from lol-boi/custom_vector_database to this engine.
"""

from custom_vector_database_spark.sources.reference_snapshot import (  # noqa: F401
    read_snapshot,
    snapshot_meta,
    write_snapshot,
)
