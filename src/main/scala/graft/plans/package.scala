package graft

/** Catalyst plan-level extensions: deliberately empty.
  *
  * Audit result (SURVEY.md §4.1, verified per query with `graft.Explain`):
  * every rewrite the reference hand-codes is a built-in Catalyst rule —
  * filter-before-read is predicate pushdown (`PushedFilters` reaches the
  * parquet scan), the embedding-column drop is column pruning
  * (`ReadSchema`), the argsort-tail top-k is `LimitPushDown` +
  * `TakeOrderedAndProject`, empty-input early exits are
  * `PropagateEmptyRelation`. Custom logic lives one level down, where
  * Catalyst is actually extensible without re-planning risk:
  *
  *  - scalar kernels as native `Expression`s with codegen
  *    ([[graft.functions.CosineSimilarity]], [[graft.functions.SimHash]],
  *    [[graft.functions.MinHashSignature]]);
  *  - table-generating functions as a `Generator`
  *    ([[graft.functions.ChunkText]]);
  *  - aggregation as a typed `Aggregator`
  *    ([[graft.functions.VectorAggregates.CentroidAgg]]);
  *  - SQL registration via `SparkSessionExtensions`
  *    ([[graft.GraftExtensions]]).
  *
  * The one plan-level rewrite that earns its keep — routing a
  * brute-force `orderBy(cosine).limit(k)` to an ANN bucket probe — is
  * implemented as [[AnnTopKRewrite]], and it is OPT-IN
  * (`spark.graft.ann.topkRewrite=true`, default off): an index probe
  * changes result semantics (approximate recall), and silently trading
  * exactness for speed inside the optimizer is the wrong default for an
  * engine whose correctness gate is hash-exact oracle comparison. The
  * explicit APIs ([[graft.search.Ann.ivfTopK]], and
  * [[graft.search.Ann.ivfSearch]] over a persisted
  * [[graft.search.Ann.writeIvf]] layout) remain the primary way to ask
  * for approximate search; the rule exists for callers who want
  * transparent routing of plans they cannot edit.
  */
package object plans
