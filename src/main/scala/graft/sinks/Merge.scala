package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE emulation (SURVEY.md §2.2 K1–K3). No Delta jar ships in this
  * image, so upserts are expressed as pure DataFrame rewrites — the
  * same plans a `MERGE INTO` would produce, minus the transactional
  * commit (idempotency comes from the rewrite-whole-table pattern the
  * reference also relies on via `ON CONFLICT`, `db/recording.py:49`).
  *
  * Scale notes: both sides shuffle on the merge keys (or the small
  * side broadcasts); at 100 TB the target would be bucketed/partitioned
  * on the key so the anti-join co-locates instead of reshuffling, and
  * the rewrite touches only affected partitions (dynamic partition
  * overwrite).
  */
object Merge {

  /** K1: `INSERT … ON CONFLICT DO NOTHING` — keep target rows, add
    * incoming rows whose key is absent (`db/recording.py:44-66`).
    *
    * Keys duplicated WITHIN `incoming` collapse to one row first —
    * without this, both copies pass the anti-join and the target's key
    * uniqueness is broken forever (every later upsert anti-joins them
    * both away, so the damage is unrepairable). Postgres keeps the
    * first VALUES row inside one DO NOTHING statement; rows have no
    * order here, so the kept copy is arbitrary — callers that care
    * which copy wins dedup upstream (the EP1 paths do, on bvid).
    */
  def upsertIgnore(target: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    target.unionByName(incoming.dropDuplicates(keys).join(target, keys, "left_anti"))

  /** K2: `INSERT … ON CONFLICT DO UPDATE` — incoming wins on key
    * collision (`db/occurrence.py:22-51`).
    *
    * Keys duplicated within `incoming` collapse to one arbitrary row
    * (see [[upsertIgnore]]; Postgres raises "cannot affect row a
    * second time" for this case — preserving the table's key
    * invariant with an arbitrary winner beats silently inserting both
    * copies).
    */
  def upsertUpdate(target: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val inc = incoming.dropDuplicates(keys)
    inc.unionByName(target.join(inc, keys, "left_anti"))
  }

  /** K3: `UPDATE target SET col = v FROM updates WHERE key match` —
    * left join + coalesce, non-matching rows untouched
    * (`dblocal.py:225-250`).
    *
    * Precondition: `updates` has at most one row per `key` (the
    * reference's `UPDATE … FROM VALUES` has the same requirement —
    * duplicate keys would multiply target rows through the join).
    */
  def joinUpdate(target: DataFrame, updates: DataFrame, key: String,
      setCols: Seq[String]): DataFrame = {
    val u = updates.select(
      col(key) +: setCols.map(c => col(c).as(s"__new_$c")): _*)
    setCols.foldLeft(target.join(u, Seq(key), "left")) { (df, c) =>
      df.withColumn(c, coalesce(col(s"__new_$c"), col(c)))
    }.drop(setCols.map(c => s"__new_$c"): _*)
  }

  /** CDC apply — the rung above K1–K3: an ORDERED batch of changes
    * (upserts and DELETES, each stamped with a sequence number) folds
    * onto the target with last-writer-wins semantics per key, the
    * contract of a Delta/Iceberg `MERGE` fed from a change stream.
    *
    * Per key, only the change with the highest `seqCol` survives
    * (hash-aggregate `max(struct(seq, op, payload))` — partial-agg
    * combinable, no per-key sort, the same sort-free argmax as the IVF
    * assignment); a key's final `delete` removes it, anything else
    * upserts. One shuffle of the (small) change batch plus the keyed
    * anti-join against the target — cost class of [[upsertUpdate]],
    * regardless of how many superseded intermediate changes the batch
    * carries.
    *
    * `changes` carries `keys` ++ `seqCol` ++ `opCol` ++ exactly the
    * target's non-key columns. Ties on (key, seq) resolve by the
    * struct order of the remaining fields — deterministic, but
    * callers should treat duplicate sequence numbers per key as a
    * producer bug (real CDC streams stamp monotone LSNs).
    */
  def applyCdc(target: DataFrame, changes: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    val payload = target.columns.filterNot(keys.contains)
    val latest = changes
      .groupBy(keys.map(col): _*)
      .agg(max(struct((col(seqCol) +: col(opCol) +: payload.map(col)): _*))
        .as("__last"))
      .select(keys.map(col) ++ Seq(col(s"__last.$opCol").as(opCol)) ++
        payload.map(c => col(s"__last.$c").as(c)): _*)
    val upserts = latest.where(col(opCol) =!= "delete").drop(opCol)
    target.join(latest.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(upserts.select(target.columns.map(col): _*))
  }
}
