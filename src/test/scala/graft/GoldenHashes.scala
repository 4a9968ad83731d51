package graft

/** Frozen golden digests (SURVEY.md §5.2 item 1). Regenerate by running
  * the suite with -Dgraft.golden.hash=PRINT and copying the reported
  * value — a deliberate act, reviewed like any contract change. */
object GoldenHashes {
  val TinyExtractDigest =
    "f47e3354bf368cbeb1b3acd3972f6bd00a985fa4f25896b8eb21ee17afafa9e7"
  /** Engine.Both over the same tiny fixture — freezes the dual-engine
    * concat format (no separator between engines, per-part headers). */
  val DualExtractDigest =
    "15e21ef0b540287f8b12b26c1b64422f5d3045f366ffbbabb0da87ca37ecabd5"
}
