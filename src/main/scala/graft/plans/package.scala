package graft

/** Custom logical/physical plan extension point — deliberately empty.
  *
  * SURVEY.md §4's conclusion holds after building the full surface:
  * every reference behavior and every added training-data operator
  * lands on built-in Catalyst paths (joins, hash aggregation,
  * window/group-limit, TakeOrderedAndProject, generators, AQE skew
  * handling). The engine's custom code sits one level lower, where it
  * pays for itself:
  *
  *  - [[graft.functions.CosineSimilarity]] — a fused codegen
  *    `Expression` (scalar kernel, not an operator),
  *  - [[graft.operators.TopKAgg]] — a bounded-heap `Aggregator`
  *    (aggregate function, planned by the existing aggregation
  *    operators),
  *  - [[graft.GraftExtensions]] — `SparkSessionExtensions` wiring that
  *    exposes those to SQL.
  *
  * A custom `LogicalPlan` + `Rule[LogicalPlan]` + `SparkStrategy`
  * would enter only for whole-operator semantics Spark cannot express
  * (e.g. a native as-of join); none of the reference's — or this
  * library's — semantics require it. Adding one anyway would mean
  * bypassing Catalyst's optimizer coverage (pushdown/pruning/AQE stop
  * understanding the plan node) for zero expressiveness gain.
  */
package object plans
