"""Column/table lineage from the analyzed logical plan.

Python counterpart of the reference's lineage extension
(extensions/spark/kyuubi-spark-lineage/.../helper/SparkSQLLineageParseHelper
.scala:56-212 — `parse(plan) → Lineage(inputTables, outputTables,
columnLineage)`), exposed both as the PLAN_ONLY `lineage` mode and a
library call. We walk the analyzed plan through py4j's TreeNode API.

Scope note (documented difference): the reference resolves column lineage
transitively through arbitrary plan depth; we resolve input TABLES fully
(all relation leaves) and column lineage one projection hop from the
top-level Project/Aggregate — enough for SELECT-list provenance.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession


def _jseq(jseq):
    """Iterate a Scala Seq via py4j."""
    for i in range(jseq.size()):
        yield jseq.apply(i)


def _walk(jnode):
    yield jnode
    for child in _jseq(jnode.children()):
        yield from _walk(child)


def _relation_name(jnode) -> str | None:
    cls = jnode.getClass().getSimpleName()
    try:
        if cls == "LogicalRelation":
            opt = jnode.catalogTable()
            if opt.isDefined():
                return opt.get().identifier().unquotedString()
            return None
        if cls == "HiveTableRelation":
            return jnode.tableMeta().identifier().unquotedString()
        if cls == "DataSourceV2Relation":
            return jnode.table().name()
        if cls == "View":
            return jnode.desc().identifier().unquotedString()
        if cls == "UnresolvedRelation":
            return ".".join(_jseq(jnode.multipartIdentifier()))
        if cls == "SubqueryAlias":
            # temp views resolve to SubqueryAlias(name, underlying-plan)
            ident = jnode.identifier()
            return ident.name()
    except Exception:
        return None
    return None


def extract_lineage(spark: SparkSession, statement: str) -> dict:
    """Lineage dict {inputTables, outputColumns, columnLineage} for a SQL
    statement, without executing it."""
    jqe = spark.sql(statement)._jdf.queryExecution()
    analyzed = jqe.analyzed()

    inputs: list[str] = []
    seen = set()
    for node in _walk(analyzed):
        name = _relation_name(node)
        if name and name not in seen:
            # only record aliases that are actual temp views / tables, not
            # user subquery aliases over computed relations
            cls = node.getClass().getSimpleName()
            if cls == "SubqueryAlias":
                tv = {t.name for t in spark.catalog.listTables()}
                if name not in tv:
                    continue
            seen.add(name)
            inputs.append(name)

    out_cols = [f.name for f in spark.sql(statement).schema.fields]

    column_lineage: dict[str, list[str]] = {}
    cls = analyzed.getClass().getSimpleName()
    try:
        exprs = None
        if cls == "Project":
            exprs = analyzed.projectList()
        elif cls == "Aggregate":
            exprs = analyzed.aggregateExpressions()
        elif cls in ("Sort", "GlobalLimit", "LocalLimit"):
            child = analyzed.children().apply(0)
            ccls = child.getClass().getSimpleName()
            if ccls == "Project":
                exprs = child.projectList()
            elif ccls == "Aggregate":
                exprs = child.aggregateExpressions()
        if exprs is not None:
            for e in _jseq(exprs):
                refs = sorted(
                    {a.name() for a in _walk_refs(e.references())}
                )
                column_lineage[e.name()] = refs
    except Exception:
        pass

    return {
        "inputTables": inputs,
        "outputColumns": out_cols,
        "columnLineage": column_lineage,
    }


def _walk_refs(jattr_set):
    it = jattr_set.iterator()
    while it.hasNext():
        yield it.next()


def lineage_json(spark: SparkSession, statement: str) -> str:
    return json.dumps(extract_lineage(spark, statement), sort_keys=True)
