"""CLI with the reference's exact command surface (main.cpp:26-37):

    python -m custom_vector_database_spark.cli <db_path> init <dim>
    python -m custom_vector_database_spark.cli <db_path> add <vector> <metadata_json>
    python -m custom_vector_database_spark.cli <db_path> get <id>
    python -m custom_vector_database_spark.cli <db_path> update <id> <vector> <metadata_json>
    python -m custom_vector_database_spark.cli <db_path> delete <id>
    python -m custom_vector_database_spark.cli <db_path> rebuild [kind]
    python -m custom_vector_database_spark.cli <db_path> search <k> <query_vector>

plus two migration extensions over the reference's own snapshot format
(vectordb.cpp:158-218):

    python -m custom_vector_database_spark.cli <db_path> import-snapshot <vectordb.json>
    python -m custom_vector_database_spark.cli <db_path> export-snapshot <vectordb.json>

Vectors are comma-separated floats (parseVector, main.cpp:8-23). Output
mirrors the reference: search prints (id, true-L2 distance) nearest-first —
sqrt of the API-level squared distance, exactly like main.cpp:115-116; get
prints id, metadata, vector; missing ids print "not found" and exit 0
(found=false is not an error, vectordb.cpp:54-80)."""

from __future__ import annotations

import json
import math
import sys


def _parse_vector(s: str) -> list[float]:
    try:
        return [float(x) for x in s.split(",") if x != ""]
    except ValueError:
        print(f"Error: invalid vector '{s}'", file=sys.stderr)
        raise SystemExit(1) from None


# command → minimum operand count (reference validates argc and prints
# usage on a short command line, main.cpp:26-37)
_MIN_ARGS = {
    "init": 1,
    "add": 1,
    "get": 1,
    "update": 2,
    "delete": 1,
    "rebuild": 0,
    "search": 2,
    "import-snapshot": 1,
    "export-snapshot": 1,
}


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return 1
    db_path, cmd, *args = argv
    if cmd in _MIN_ARGS and len(args) < _MIN_ARGS[cmd]:
        print(f"Error: '{cmd}' needs at least {_MIN_ARGS[cmd]} argument(s)",
              file=sys.stderr)
        print(__doc__, file=sys.stderr)
        return 1

    from custom_vector_database_spark.session import get_spark
    from custom_vector_database_spark.vector_table import VectorTable

    spark = get_spark("cvdb-cli")
    table = VectorTable(spark, db_path)

    if cmd == "init":
        table.init(dim=int(args[0]))
        print(f"Initialized database with dimension {args[0]}")
    elif cmd == "add":
        vec = _parse_vector(args[0])
        metadata = args[1] if len(args) > 1 else None
        if metadata is not None:
            json.loads(metadata)  # reference parses/validates (main.cpp:68)
        ids = table.add([(vec, metadata)])
        print(f"Added vector with ID: {ids[0]}")
    elif cmd == "get":
        row, found = table.get(int(args[0]))
        if not found:
            print(f"Vector with ID {args[0]} not found")
        else:
            print(f"ID: {row['id']}")
            print(f"Metadata: {row['metadata']}")
            print(f"Vector: [{', '.join(str(x) for x in row['vec'])}]")
    elif cmd == "update":
        ok = table.update(int(args[0]), _parse_vector(args[1]),
                          args[2] if len(args) > 2 else None)
        print("Updated" if ok else f"Vector with ID {args[0]} not found")
    elif cmd == "delete":
        ok = table.delete(int(args[0]))
        print("Deleted" if ok else f"Vector with ID {args[0]} not found")
    elif cmd == "rebuild":
        # optional kind operand (extension; bare `rebuild` keeps the
        # reference's LSH default): lsh | ivf | ivfbq
        kind = args[0] if args else "lsh"
        table.rebuild(kind=kind)
        print(f"Index rebuilt ({kind})")
    elif cmd == "import-snapshot":  # extension: migrate FROM the reference
        table.import_snapshot(args[0])
        print(f"Imported snapshot {args[0]} into {db_path}")
    elif cmd == "export-snapshot":  # extension: export back TO the reference
        table.export_snapshot(args[0])
        print(f"Exported {db_path} to snapshot {args[0]}")
    elif cmd == "search":
        k = int(args[0])
        query = _parse_vector(args[1])
        rows = table.search(query, k).collect()
        if not rows:
            print("No results (empty database?)")
        for r in rows:
            print(f"ID: {r['id']}, Distance: {math.sqrt(r['dist_sq'])}")
    else:
        print(f"Unknown command: {cmd}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
