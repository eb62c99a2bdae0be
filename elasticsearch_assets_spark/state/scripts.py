"""ES stored scripts (`PUT/GET/DELETE _scripts/<id>`).

Reference behavior: ES keeps named scripts in cluster state; queries
reference them by id ({"script": {"id": ...}}), so operational teams
version one script instead of inlining it into every request.

Here a script is a Spark SQL expression — the engine's ONE script
dialect (script_score / script queries / update_by_query / ingest all
share it; painless is out of scope by design). The store is a JSON file
per registry with atomic temp+os.replace writes (the repo's metadata
contract — safe under hard-link clones). Validation compiles the
expression at PUT time so a broken script fails loudly at storage, not
at query time (ES validates painless the same way).
"""

from __future__ import annotations

import json
import os
import re

_STORE = "scripts.json"


def _load(store_dir: str) -> dict:
    path = os.path.join(store_dir, _STORE)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _save(store_dir: str, data: dict) -> None:
    os.makedirs(store_dir, exist_ok=True)
    tmp = os.path.join(store_dir, _STORE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(data, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(store_dir, _STORE))


def put_script(store_dir: str, script_id: str, source: str) -> None:
    """Store (or overwrite) a named script. The expression is compiled
    through Catalyst's parser immediately — invalid scripts are rejected
    at PUT time."""
    if not re.match(r"^[A-Za-z0-9_.-]+$", script_id):
        raise ValueError(f"bad script id {script_id!r}")
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None:
        # parse-only through Catalyst's expression parser (F.expr is
        # lazy in Spark 4 — Column creation no longer parses); raises
        # ParseException on bad source without resolving columns
        spark._jsparkSession.sessionState().sqlParser().parseExpression(
            source
        )
    data = _load(store_dir)
    data[script_id] = {"lang": "spark-sql", "source": source}
    _save(store_dir, data)


def get_script(store_dir: str, script_id: str) -> str:
    data = _load(store_dir)
    if script_id not in data:
        raise KeyError(f"no stored script {script_id!r}")
    return data[script_id]["source"]


def delete_script(store_dir: str, script_id: str) -> None:
    data = _load(store_dir)
    if script_id not in data:
        raise KeyError(f"no stored script {script_id!r}")
    del data[script_id]
    _save(store_dir, data)


def list_scripts(store_dir: str) -> "dict[str, str]":
    return {k: v["source"] for k, v in _load(store_dir).items()}
