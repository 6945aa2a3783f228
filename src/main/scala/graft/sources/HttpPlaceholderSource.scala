package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull, StringStartsWith}
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source for the reference's throttled sensor-HTTP
  * ingest (reference: app.py:285-313 fetch, 399-431 per-IP
  * semaphore(3) rate limiting). Two fetch modes:
  *
  *  - `fetchMode=live`: a REAL HTTP GET per url through the bounded
  *    per-host client pool; success emits a FETCHED row with the body
  *    byte count, any failure emits the reference's dead-letter
  *    placeholder row (app.py:315-334) instead of failing the task.
  *    Contract-tested against a loopback server inside the test JVM
  *    (no external network in this environment — and no live sensors,
  *    which is why the default stays stub).
  *  - `fetchMode=stub` (default): every planned request
  *    deterministically yields the dead-letter row, exercising all
  *    planning/throttle plumbing with zero I/O.
  *
  * The DSv2 plumbing is identical in both modes and contract-tested:
  *
  *  - `urls` option → the request manifest;
  *  - one `InputPartition` per host — the unit of parallelism, exactly
  *    the reference's group-by-sensor-IP (app.py:391-397), so a 1000-
  *    executor cluster fetches from distinct sensors concurrently while
  *    each host sees one task;
  *  - `maxConcurrentPerHost` (default 3) — ENFORCED in the reader by a
  *    fixed client pool of that size (the reference's semaphore), and
  *    exposed in the output for inspection; the bound is asserted by a
  *    contract test in both modes.
  *
  * Usage: `spark.read.format("graft.sources.HttpPlaceholderSource")
  * .option("urls", "http://10.0.0.1/a,http://10.0.0.2/b").load()`.
  */
class HttpPlaceholderSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpPlaceholderSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HttpTable(new CaseInsensitiveStringMap(properties))
}

object HttpPlaceholderSource {
  val schema: StructType = new StructType()
    .add("url", StringType)
    .add("host", StringType)
    .add("status", StringType)
    .add("error_type", StringType)
    .add("max_concurrent", IntegerType)
    .add("n_bytes", IntegerType) // body size on live fetch; -1 for dead-letter/stub rows

  private[sources] def hostOf(url: String): String = {
    val stripped = url.replaceFirst("^[a-z]+://", "")
    stripped.takeWhile(c => c != '/' && c != '?')
  }

  /** Test instrumentation: highest number of simultaneously in-flight
    * fetches ever observed, per host, in this JVM (local-mode tests
    * share the executor JVM; on a cluster this is per-executor). The
    * contract spec asserts it never exceeds `maxConcurrentPerHost`. */
  private[graft] val observedMaxConcurrent =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
}

private class HttpTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "http_placeholder"
  override def schema(): StructType = HttpPlaceholderSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(opts)
    new HttpScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

/** ScanBuilder with REAL pushdown, the part of a fetch source that
  * matters at scale: a pushed `host = …`/`host IN …` predicate prunes
  * whole host PARTITIONS — those sensors are never contacted at all
  * (the DSv2 analogue of partition pruning), and a pushed
  * `url LIKE 'prefix%'` prunes individual requests before any fetch.
  * Column pruning trims the emitted rows to the projected fields so a
  * `select("host")` never materializes the rest. Unsupported filters
  * are returned to Spark and evaluated post-scan as usual. */
private class HttpScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = HttpPlaceholderSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"http_placeholder PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("host", _: String) => true
      case In("host", vs) => vs.forall(_.isInstanceOf[String])
      case StringStartsWith("url", _) => true
      case IsNotNull(_) => true // this source never emits nulls
      case _ => false
    }
    pushed = accepted
    rejected // Spark re-applies these after the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  private def hostSurvives(host: String): Boolean = pushed.forall {
    case EqualTo("host", v: String) => host == v
    case In("host", vs) => vs.contains(host)
    case _ => true
  }
  private def urlSurvives(url: String): Boolean = pushed.forall {
    case StringStartsWith("url", prefix) => url.startsWith(prefix)
    case _ => true
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val urls = Option(options.get("urls")).map(_.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(Seq.empty)
    val maxPerHost = options.getInt("maxConcurrentPerHost", 3)
    val fetchMode = Option(options.get("fetchMode")).getOrElse("stub")
    urls.filter(urlSurvives)
      .groupBy(HttpPlaceholderSource.hostOf)
      .filter { case (host, _) => hostSurvives(host) }
      .toSeq.sortBy(_._1)
      .map { case (host, hostUrls) =>
        HttpHostPartition(host, hostUrls.sorted.toArray, maxPerHost,
          required.fieldNames, fetchMode): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new HttpHostReader(partition.asInstanceOf[HttpHostPartition])
}

private case class HttpHostPartition(
    host: String, urls: Array[String], maxPerHost: Int,
    fields: Array[String], fetchMode: String) extends InputPartition

/** One reader per host, fetching through a REAL bounded client pool of
  * `maxPerHost` threads — the reference's per-IP semaphore(3)
  * (app.py:399-401) made enforceable: at no point are more than
  * `maxPerHost` fetches in flight against this host, measured and
  * asserted in SinkSourceSpec via `observedMaxConcurrent`. Only the
  * fetch BODY is stubbed (no live sensors): it simulates network
  * latency and yields the reference's CONNECTION_ERROR placeholder row
  * (app.py:315-334). Rows surface in submission order, so output is
  * deterministic regardless of completion interleaving. */
private class HttpHostReader(p: HttpHostPartition)
    extends PartitionReader[InternalRow] {
  import java.util.concurrent.{Callable, Executors, Future}

  private val pool = Executors.newFixedThreadPool(math.max(p.maxPerHost, 1))
  private val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)

  private def row(url: String, status: String, errorType: String, nBytes: Int): InternalRow = {
    val full = Map[String, Any](
      "url" -> UTF8String.fromString(url),
      "host" -> UTF8String.fromString(p.host),
      "status" -> UTF8String.fromString(status),
      "error_type" -> UTF8String.fromString(errorType),
      "max_concurrent" -> p.maxPerHost,
      "n_bytes" -> nBytes)
    // emit only the pruned columns, in the scan's field order
    new GenericInternalRow(p.fields.map(full(_)))
  }

  private def fetch(url: String): InternalRow = {
    val now = inFlight.incrementAndGet()
    HttpPlaceholderSource.observedMaxConcurrent
      .merge(p.host, Int.box(now), (a, b) => Int.box(math.max(a, b)))
    try {
      if (p.fetchMode == "live") {
        // real GET; any failure becomes the reference's dead-letter
        // row (app.py:315-334) rather than a task failure
        try {
          val conn = new java.net.URI(url).toURL.openConnection()
            .asInstanceOf[java.net.HttpURLConnection]
          conn.setConnectTimeout(2000)
          conn.setReadTimeout(5000)
          val in = conn.getInputStream
          val body = try in.readAllBytes() finally { in.close(); conn.disconnect() }
          row(url, "FETCHED", "NONE", body.length)
        } catch {
          case _: Exception => row(url, "PLACEHOLDER_FILE", "CONNECTION_ERROR", -1)
        }
      } else {
        // ---- STUB: deterministic dead-letter row, no I/O
        Thread.sleep(2) // simulated network latency keeps the pool busy
        row(url, "PLACEHOLDER_FILE", "CONNECTION_ERROR", -1)
        // ---- end STUB
      }
    } finally inFlight.decrementAndGet()
  }

  private val futures: Array[Future[InternalRow]] =
    p.urls.map(u => pool.submit(new Callable[InternalRow] {
      override def call(): InternalRow = fetch(u)
    }))

  private var i = -1
  override def next(): Boolean = { i += 1; i < futures.length }
  override def get(): InternalRow = futures(i).get()
  override def close(): Unit = pool.shutdownNow()
}
