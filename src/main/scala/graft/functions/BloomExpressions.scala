package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Column-valued Bloom probing (SURVEY north-star scale path).
  *
  * Spark's own `BloomFilterMightContain` requires the serialized
  * filter to be a CONSTANT (literal or scalar subquery) — fine for one
  * corpus-wide filter, but the >10⁸-item catalog path shards one
  * filter per catalog bucket, and a sharded probe needs the filter to
  * arrive as a JOIN COLUMN (each batch row probes its own shard's
  * filter). This expression closes that gap: the filter operand is an
  * ordinary BINARY column in TAGGED form — a 16-byte content tag
  * followed by the standard `BloomFilter.writeTo` serialization — and
  * deserialization is amortized through a tag-keyed executor-local
  * cache, so a co-partitioned probe deserializes each shard's filter
  * once per executor, not once per row.
  */
object BloomExpressions {

  /** Bytes prepended to the serialized filter: md5 of the payload —
    * content-addressed, so replays/rebuilds of an identical filter hit
    * the same cache slot and a changed filter can never alias a stale
    * entry.
    */
  val TagBytes = 16

  /** Executor-local deserialized-filter cache. Bounded: a catalog
    * version contributes `nShards` entries (tens, not thousands);
    * crossing the bound evicts a single arbitrary entry — never the
    * whole map, so a working set larger than the bound (many shards ×
    * concurrent catalog versions) degrades to one eviction per miss
    * instead of wholesale re-deserialization. Correctness never
    * depends on residency, only speed.
    */
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, BloomFilter]()
  private val MaxEntries = 256

  /** Static probe entry point (also the codegen call target). */
  def probe(tagged: Array[Byte], hash: Long): Boolean = {
    // a filter shorter than tag + payload is a caller bug (e.g. raw
    // BloomFilter.writeTo bytes without the tag prefix) — fail loudly
    // rather than index out of bounds or mis-key the cache
    require(tagged.length > TagBytes,
      s"bloom_might_contain_tagged expects a ${TagBytes}-byte content tag " +
        s"followed by the serialized filter; got ${tagged.length} bytes")
    val key = new String(tagged, 0, TagBytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    var bf = cache.get(key)
    if (bf == null) {
      bf = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(tagged, TagBytes, tagged.length - TagBytes))
      while (cache.size() >= MaxEntries) {
        val it = cache.keySet().iterator()
        if (it.hasNext) { it.next(); it.remove() } // evict one, keep the rest warm
      }
      cache.put(key, bf)
    }
    bf.mightContainLong(hash)
  }

  /** `bloom_might_contain_tagged(taggedFilter BINARY, hash BIGINT) →
    * BOOLEAN` — null filter/hash → null (a shard with no catalog rows
    * joins null; callers treat null as definitely-new).
    */
  case class BloomMightContainTagged(left: Expression, right: Expression)
      extends BinaryExpression
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    // declared input types buy analysis-time errors (and INT→BIGINT
    // hash coercion) instead of a runtime ClassCastException in eval
    override def inputTypes: Seq[DataType] =
      Seq(org.apache.spark.sql.types.BinaryType, org.apache.spark.sql.types.LongType)
    override def dataType: DataType = BooleanType
    override def nullSafeEval(f: Any, h: Any): Any =
      probe(f.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (f, h) =>
        s"graft.functions.BloomExpressions.probe($f, $h)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContainTagged =
      copy(l, r)
    override def prettyName: String = "bloom_might_contain_tagged"
  }

  def bloom_might_contain_tagged(filter: Column, hash: Column): Column =
    ColumnBridge.column(BloomMightContainTagged(
      ColumnBridge.expression(filter), ColumnBridge.expression(hash)))
}
