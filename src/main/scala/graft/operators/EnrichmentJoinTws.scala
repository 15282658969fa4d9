package graft.operators

import graft.core.{Address, User, UserAddress}
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** J1 on Spark 4's `transformWithState` — the scale-path backend.
  *
  * `flatMapGroupsWithState` must rewrite the key's ENTIRE state value
  * (user + full address list) on every event: O(list) write amplification
  * per address, which is what kills unbounded per-key lists at 100 TB. This
  * processor keeps the user in a `ValueState` and the addresses in a
  * `ListState`, so an address arrival is a single O(1) RocksDB append; the
  * full list is only read on emission (which the cumulative-snapshot
  * contract requires anyway). State TTL is native (`TTLConfig`) instead of
  * hand-rolled timeout handling.
  *
  * Semantics are identical to `EnrichmentJoin` (SURVEY.md §2.1, reference
  * `/root/reference/src/main/java/Main.java:78-133`) and pinned by the same
  * scenario matrix in EnrichmentJoinTwsSpec.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`).
  */
class EnrichmentProcessor(stateTtl: Option[java.time.Duration])
    extends StatefulProcessor[String, Envelope, UserAddress] {

  @transient private var userState: ValueState[User] = _
  @transient private var addrState: ListState[Address] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val ttl = stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    userState = getHandle.getValueState[User]("user", Encoders.product[User], ttl)
    addrState = getHandle.getListState[Address]("addresses", Encoders.product[Address], ttl)
  }

  override def handleInputRows(key: String, rows: Iterator[Envelope],
      timerValues: TimerValues): Iterator[UserAddress] = {
    val out = Vector.newBuilder[UserAddress]
    // cache the list once per (key, batch); appends go to both the local
    // buffer and the incremental ListState
    var addrs: Vector[Address] = null
    def loadedAddrs(): Vector[Address] = {
      if (addrs == null) addrs = addrState.get().toVector
      addrs
    }
    rows.toVector.sortBy(_.seq).foreach {
      case Envelope(_, _, Some(u), _) =>
        // Main.java:104-115 — store/overwrite, ALWAYS emit current snapshot
        userState.update(u)
        out += UserAddress(u, loadedAddrs())
      case Envelope(_, _, _, Some(a)) =>
        // Main.java:118-132 — O(1) append; emit only if user known.
        // Snapshot the list BEFORE appending: the append is immediately
        // visible to get(), so reading after would double-count.
        addrs = loadedAddrs() :+ a
        addrState.appendValue(a)
        if (userState.exists()) out += UserAddress(userState.get(), addrs)
      case _ =>
    }
    out.result().iterator
  }
}

object EnrichmentJoinTws {
  /** Streaming J1 via transformWithState (Spark 4 scale path). */
  def joinStream(
      spark: SparkSession,
      events: Dataset[Envelope],
      stateTtl: Option[java.time.Duration] = None): Dataset[UserAddress] = {
    import spark.implicits._
    // state TTL requires the processing-time mode (TTL expiry is stamped
    // against batch processing time); without TTL, TimeMode.None avoids
    // the per-batch timestamp bookkeeping
    val timeMode =
      if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .groupByKey(_.key)
      .transformWithState(
        new EnrichmentProcessor(stateTtl), timeMode, OutputMode.Append())
  }
}
