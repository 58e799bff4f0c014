package graft

/** Custom logical/physical plans: deliberately EMPTY.
  *
  * The reference has no relational algebra layer to port — its only
  * "query language" is a parameter map over stream scans plus a user
  * fold (SURVEY.md §4.1), and every operator in the declared surface
  * (SURVEY.md §2.3) is expressible with Catalyst's built-in operators:
  * scans with pushdown, hash/sort aggregates, broadcast/shuffle joins
  * (incl. the as-of and range joins as equi-join + window/filter
  * compositions), window functions, session windows, and streaming
  * stateful aggregation.
  *
  * Where the built-ins genuinely could not carry the semantics or the
  * cost, the extension point chosen was the EXPRESSION layer, not the
  * plan layer (SURVEY.md §7.3 preference order): `graft.functions`
  * contains native codegen expressions (simhash64, vec_dot,
  * shingle_hashes, minhash_sig, poly_hash) injected via
  * [[graft.GraftExtensions]]. A custom LogicalPlan/SparkStrategy would
  * add scheduling surface without changing any plan shape Catalyst
  * doesn't already produce — this file records that decision so a later
  * round doesn't "discover" the empty package as a gap.
  */
package object plans
