"""ES Watcher: input -> condition -> actions, set-oriented.

Reference behavior: an ES watch runs a search input on a schedule,
evaluates a condition over the payload (`ctx.payload.*` compare), and
fires actions when it's met (alerting docs). Scheduling belongs to the
orchestrator (Airflow/cron — ES's trigger is just that); what the engine
owns is the INPUT + CONDITION + ACTION-ROUTING evaluation, which is one
aggregation plan here.

Watch shape (the ES JSON, declaratively re-expressed):

    {
      "input":     {"filter": "<sql over the frame>",     # optional
                    "aggs": {"name": "<agg expr>", ...}},
    "condition": "<sql over the agg names>",            # boolean
      "actions":   ["log", "notify", ...]                 # labels
    }

`execute_watch` returns {"payload": {...}, "condition_met": bool,
"actions_fired": [...]} — the ES execution record. The input compiles to
filter + ONE hash aggregate; the condition is a literal projection over
that single row. No driver-side iteration: at 100 TB the watch costs
exactly its aggregation query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def execute_watch(df: DataFrame, watch: dict) -> dict:
    """Evaluate an ES-shaped watch against a frame. The trigger/schedule
    is the caller's (ES: the watcher scheduler; here: cron/Structured
    Streaming foreachBatch over the same function)."""
    inp = watch.get("input") or {}
    aggs = inp.get("aggs")
    if not aggs:
        raise ValueError('watch needs input.aggs ({"name": "<agg expr>"})')
    cond = watch.get("condition")
    if not cond:
        raise ValueError("watch needs a condition expression")
    actions = watch.get("actions", [])
    src = df.where(F.expr(inp["filter"])) if inp.get("filter") else df
    row = src.agg(
        *[F.expr(e).alias(n) for n, e in aggs.items()]
    ).withColumn("_met", F.expr(cond).cast("boolean"))
    got = row.head()
    met = bool(got["_met"]) if got["_met"] is not None else False
    return {
        "payload": {n: got[n] for n in aggs},
        "condition_met": met,
        "actions_fired": list(actions) if met else [],
    }
