package graft.config

/** The oracle-robustness knob — one line to flip the entire portable
  * hash-chain constant family on BOTH engines:
  *
  *   SPARK_GRAFT_PORTABLE_SALT=B python3 tools/selfcheck.py ...
  *
  * The portable verification chains bake constants into both the
  * Spark plan and the DuckDB oracle SQL: the md5-60 string hash
  * ([[graft.operators.Dedup.portableHash60]] / SparkEntry.duckHex60),
  * the MinHash coefficient seed, the hyperplane seeds, and the Knuth
  * multiplier of the centroid-seed chain. A full-gate pass under an
  * ALTERNATE salt shows the oracles verify the algorithm, not one
  * lucky constant: every derived value changes (different signatures,
  * buckets, candidate pairs, seed cells), and the two engines must
  * re-agree bit-for-bit on the new family.
  *
  * With the variable unset (the default), every value below equals
  * the committed baseline exactly — zero behavior change.
  */
/** Init-safe companion for [[PortableSalt]]: tool entry points call
  * [[SaltEnv.validate]] / [[SaltEnv.requireUnsalted]] BEFORE anything
  * touches `PortableSalt` — an invalid env value then fails with a
  * clear IllegalArgumentException at startup instead of an opaque
  * ExceptionInInitializerError at the first salted expression deep
  * inside a query. Holds no derived state, so touching it never
  * forces `PortableSalt`'s initialization.
  */
object SaltEnv {
  def raw: String = sys.env.getOrElse("SPARK_GRAFT_PORTABLE_SALT", "")

  /** Fail fast, with the variable named, on a non-alphanumeric salt. */
  def validate(): Unit =
    if (!raw.matches("[A-Za-z0-9]*"))
      throw new IllegalArgumentException(
        s"SPARK_GRAFT_PORTABLE_SALT must be alphanumeric (it is interpolated " +
          s"into oracle SQL literals), got '$raw' — unset it or fix the value")

  /** Baseline-gated tools (SmokeGate, PipelineGate, baseline-writing
    * ShuffleMeter runs) compare against artifacts generated UNSALTED;
    * a salted run reseeds every operator's production defaults
    * process-wide and would spuriously breach — or worse, poison a
    * regenerated baseline. Those entry points call this first.
    */
  def requireUnsalted(tool: String): Unit = {
    validate()
    if (raw.nonEmpty)
      throw new IllegalStateException(
        s"$tool compares against committed baselines generated without a salt; " +
          s"unset SPARK_GRAFT_PORTABLE_SALT (currently '$raw') — the salt knob " +
          s"is for oracle-robustness correctness sweeps (selfcheck), not gates")
  }
}

object PortableSalt {

  /** Alphanumeric only: the salt is interpolated into oracle SQL
    * string literals.
    */
  val salt: String = {
    SaltEnv.validate()
    SaltEnv.raw
  }

  val isDefault: Boolean = salt.isEmpty

  /** Stable small fingerprint of the salt (0 when unsalted). */
  private val fp: Long = salt.foldLeft(0L)((a, c) => a * 131 + c.toLong)

  /** Prefix prepended to the md5 input of the portable 60-bit string
    * hash — on both engines.
    */
  val hashPrefix: String = salt

  /** Seed for MinHash coefficients and hyperplane generation
    * (default 42 — the committed family).
    */
  val seed: Long = 42L + fp * 1000003L

  /** Knuth multiplier of the portable centroid-seed chain
    * `(id % 1000003) * seedMul % 2147483647` (default 2654435761).
    * Kept odd and < 2^36 so the product of a 20-bit residue stays far
    * from 2^63 under ANSI mode.
    */
  val seedMul: Long = 2654435761L ^ ((fp & 0xFFFFL) << 12)
}
