package graft.engine

import java.sql.Timestamp
import scala.collection.mutable

/** Runtime order-book state for the sequential trading fold.
  *
  * This is a faithful re-implementation of the reference's path-dependent
  * state machine (reference strats.py:24-245, 252-420) — its quirks are
  * part of the spec because the golden tests assert bit-exact floats
  * (SURVEY.md §7.4). Quirks deliberately replicated:
  *
  *  - Buying power mutates on every `buy` call: `current_amount +=
  *    order_worth()` where each *open* order contributes its per-share
  *    start price (NOT × shares) and each completed order contributes full
  *    profit × shares (strats.py:215-224, 293-300).
  *  - `sell(num_shares = -1)` closes only the *oldest* open order
  *    (strats.py:192-199).
  *  - Partial fills duplicate the remainder order in the open deque (the
  *    `_replace_order` + `close_order` double-appendleft, strats.py:151 and
  *    204-205) and `fill` overwrites `num_shares` with the fill quantity
  *    (strats.py:81), making the fill loop single-iteration.
  *  - Auto-sizing floors `current_amount / price` (strats.py:381-382) and
  *    rejects when `current_amount < price * num_shares` (strats.py:384).
  *  - Stop-losses are drained lazily at the *next* buy/sell call, lowest
  *    stop first, scanning past closes in `[order_start, trading_date)`
  *    (strats.py:302-326), and always close the oldest order via the
  *    `min(shares, -1)` quirk (strats.py:371-376).
  */
final class OrderState(
    var numShares: Double,
    val id: Long,
    val stopLoss: Option[Double],
    val startTime: Timestamp,
    val startAmount: Double) extends Serializable {
  var endTime: Timestamp = _
  var endAmount: Double = Double.NaN
  var profit: Double = Double.NaN
  var filled: Boolean = false

  /** strats.py:70-84 — num_shares == -1 keeps the original share count. */
  def fill(n: Double, endT: Timestamp, endA: Double): Unit = {
    if (n != -1d) numShares = n
    endTime = endT
    endAmount = endA
    filled = true
  }

  /** strats.py:86-93. */
  def profitLoss(): Double = {
    profit = (endAmount - startAmount) * numShares
    profit
  }

  /** strats.py:95-97 — order value is end amount when filled else start. */
  def value: Double = if (filled) endAmount else startAmount
}

/** FIFO book: open deque, completed list, share ledger (strats.py:133-245). */
final class OrderManager extends Serializable {
  val openOrders = new mutable.ArrayDeque[OrderState]()
  val completedOrders = new mutable.ArrayBuffer[OrderState]()
  /** date → total shares after that date's trades; last write per date
    * wins, mirroring the dict at strats.py:137/175/198/212. */
  val sharesOwned = new mutable.LinkedHashMap[Timestamp, Double]()
  var totalOrders: Int = 0
  var totalShares: Double = 0.0
  val byId = new mutable.HashMap[Long, OrderState]()
  private var nextId: Long = 0L

  def freshId(): Long = { nextId += 1; nextId }

  /** strats.py:155-177. */
  def newOrder(numShares: Double, id: Long, startT: Timestamp, startA: Double,
      stopLoss: Option[Double]): OrderState = {
    val o = new OrderState(numShares, id, stopLoss, startT, startA)
    openOrders.append(o)
    totalOrders += 1
    totalShares += numShares
    sharesOwned(startT) = totalShares
    byId(id) = o
    o
  }

  /** strats.py:142-153 — note the appendleft here PLUS the caller's
    * appendleft in closeOrder: the remainder lands in the deque twice. */
  private def replaceOrder(order: OrderState, numShares: Double): OrderState = {
    val id = freshId()
    val rep = new OrderState(order.numShares - numShares, id, order.stopLoss,
      order.startTime, order.startAmount)
    openOrders.prepend(rep)
    byId(id) = rep
    rep
  }

  /** strats.py:179-213. Left = the single closed order (the -1 fast path
    * returns the live object, whose share count later mutations show
    * through — pandas object-column semantics); Right = packet share
    * total, a snapshot like `_Order_Packet.num_shares` (strats.py:128-130).
    */
  def closeOrder(numShares: Double, endT: Timestamp,
      endA: Double): Either[OrderState, Double] = {
    if (numShares == -1d && openOrders.nonEmpty) {
      val o = openOrders.removeHead()
      o.fill(numShares, endT, endA)
      o.profitLoss()
      completedOrders.append(o)
      totalShares -= o.numShares
      sharesOwned(endT) = totalShares
      return Left(o)
    }
    var packetShares = 0.0
    var n = numShares
    while (n > 0 && openOrders.nonEmpty) {
      val o = openOrders.removeHead()
      if (n < o.numShares) {
        val rep = replaceOrder(o, n)
        openOrders.prepend(rep) // double-insert quirk, strats.py:204-205
      }
      o.fill(n, endT, endA)
      o.profitLoss()
      packetShares += o.numShares
      completedOrders.append(o)
      totalShares -= n
      n -= o.numShares
    }
    sharesOwned(endT) = totalShares
    Right(packetShares)
  }

  /** strats.py:215-224 — completed at profit × shares, open at raw
    * per-share start price; both folded left-to-right in list order to
    * keep float association identical. */
  def orderWorth(): Double = {
    var comp = 0.0
    completedOrders.foreach(o => comp += o.profitLoss())
    var open = 0.0
    openOrders.foreach(o => open += o.value)
    comp - open
  }
}

/** Array-backed binary min-heap of (stopPrice, orderId) with lexicographic
  * ordering — the exact layout and tie semantics of Python's heapq
  * (reference strats.py:314,393-395). Owned implementation because Scala's
  * PriorityQueue does not survive Kryo state-store round-trips in
  * Structured Streaming.
  */
final class StopLossHeap extends Serializable {
  private val a = new mutable.ArrayBuffer[(Double, Long)]()
  def isEmpty: Boolean = a.isEmpty
  def nonEmpty: Boolean = a.nonEmpty
  def head: (Double, Long) = a(0)
  private def lt(x: (Double, Long), y: (Double, Long)): Boolean =
    x._1 < y._1 || (x._1 == y._1 && x._2 < y._2)
  def enqueue(v: (Double, Long)): Unit = {
    a.append(v)
    var i = a.length - 1
    while (i > 0 && lt(a(i), a((i - 1) / 2))) {
      val p = (i - 1) / 2
      val t = a(i); a(i) = a(p); a(p) = t
      i = p
    }
  }
  def dequeue(): (Double, Long) = {
    val out = a(0)
    val last = a.remove(a.length - 1)
    if (a.nonEmpty) {
      a(0) = last
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var s = i
        if (l < a.length && lt(a(l), a(s))) s = l
        if (r < a.length && lt(a(r), a(s))) s = r
        if (s == i) done = true
        else { val t = a(i); a(i) = a(s); a(s) = t; i = s }
      }
    }
    out
  }
}

/** The per-ticker trading session driving the book — the engine half of the
  * reference's Strategy base class (strats.py:252-420). Strategy *signal*
  * logic lives in graft.strategy as vectorized DataFrame ops; this class is
  * only the sequential buy/sell/stop-loss machinery shared by all
  * strategies. Serializable so it can live as streaming GroupState.
  */
final class TradingSession(initialAmount: Double) extends Serializable {
  val orders = new OrderManager
  var currentAmount: Double = initialAmount
  var activeOrders: Double = 0.0
  /** min-heap of (stopPrice, orderId) — heapq at strats.py:393-395. */
  val stopLossHeap = new StopLossHeap
  /** date → order/packet share-count accessor (read at fold end so later
    * mutations of num_shares show through, like pandas object columns —
    * SURVEY.md §1.2). */
  val buyOrders = new mutable.LinkedHashMap[Timestamp, OrderState]()
  val sellOrders = new mutable.LinkedHashMap[Timestamp, Either[OrderState, Double]]()
  /** past (date, close) bars in order, for stop-loss exit scans. */
  private val pastDates = new mutable.ArrayBuffer[Timestamp]()
  private val pastCloses = new mutable.ArrayBuffer[Double]()

  def observeBar(date: Timestamp, close: Double): Unit = {
    pastDates.append(date)
    pastCloses.append(close)
  }

  /** strats.py:293-300 — mutating buying-power accumulator. */
  private def currAmnt(): Double = {
    currentAmount += orders.orderWorth()
    currentAmount
  }

  /** strats.py:302-326. Returns (exitPrice, exitDate, orderId) or None.
    * Note the popped heap entry stays popped even when no exit matched. */
  private def exitStopLoss(tradingDate: Timestamp): Option[(Double, Timestamp, Long)] = {
    if (stopLossHeap.isEmpty ||
        orders.byId(stopLossHeap.head._2).startTime.compareTo(tradingDate) > 0)
      return None
    val (sl, uid) = stopLossHeap.dequeue()
    val start = orders.byId(uid).startTime
    var i = 0
    while (i < pastDates.length) {
      val d = pastDates(i)
      if (pastCloses(i) <= sl && d.compareTo(start) >= 0 &&
          d.compareTo(tradingDate) < 0)
        return Some((pastCloses(i), d, uid))
      i += 1
    }
    None
  }

  /** strats.py:328-341. */
  private def sellFunctionality(shares: Double, endTime: Timestamp,
      endAmount: Double): Unit = {
    val closed = orders.closeOrder(shares, endTime, endAmount)
    activeOrders -= closed.fold(_.numShares, identity)
    sellOrders(endTime) = closed
  }

  private def drainStopLosses(date: Timestamp): Unit = {
    var sl = exitStopLoss(date)
    while (sl.isDefined) {
      val (price, exitDate, uid) = sl.get
      // min(order_shares, -1) == -1 always → closes the oldest order
      // (strats.py:371-376), a replicated reference quirk.
      val n = math.min(orders.byId(uid).numShares, -1d)
      sellFunctionality(n, exitDate, price)
      sl = exitStopLoss(date)
    }
  }

  /** strats.py:343-395. */
  def buy(date: Timestamp, price: Double, numShares: Double = -1d,
      stopLoss: Option[Double] = None): Unit = {
    drainStopLosses(date)
    val uid = orders.freshId()
    val amount = currAmnt()
    var n = numShares
    // A ZERO price does not crash the reference: strats.py:382's
    // `current_amount // price` runs on numpy float64 (pandas Series
    // elements), where x // 0.0 is IEEE ±inf (nan for 0 // 0) with a
    // warning — NOT CPython's ZeroDivisionError. The affordability
    // check then compares amount < 0 * inf = nan, which is False, so
    // the reference PLACES an inf-share order and the portfolio
    // arithmetic propagates inf/nan from there (observed on the
    // driver's zero-priced bars: reference net worths of ±inf/nan).
    // Replicate exactly: plain IEEE division when price == 0 (numpy's
    // floor_divide-by-zero result), pyFloorDiv otherwise; NaN
    // comparisons below behave identically in Java and numpy. The
    // reference's division precondition (num_shares == -1 AND
    // current_amount > 0) is mirrored: with amount <= 0 it skips the
    // division and places a -1-share order (0 < 0*-1 is false) — that
    // quirk path falls through here too.
    if (n == -1d && amount > 0)
      n = if (price == 0d) amount / price else pyFloorDiv(amount, price)
    if (amount < price * n) return
    val order = orders.newOrder(n, uid, date, price, stopLoss)
    activeOrders += n
    buyOrders(date) = order
    stopLoss.foreach(sl => stopLossHeap.enqueue((sl, order.id)))
  }

  /** CPython float floor-division (floatobject.c float_floor_div), used by
    * the reference's share sizing `current_amount // price`
    * (strats.py:382). NOT equivalent to `floor(a / b)`: CPython goes
    * through fmod, so `a - mod` is an exact multiple of `b` and the
    * result is the TRUE floor even when `a / b` rounds up across an
    * integer boundary — at ~1e16 buying power a one-share difference
    * flips the `amount < price * n` affordability check.
    */
  private[graft] def pyFloorDiv(a: Double, b: Double): Double = {
    var mod = a % b // JVM double % == C fmod (truncated, sign of dividend)
    var div = (a - mod) / b
    if (mod != 0.0 && ((b < 0.0) != (mod < 0.0))) { mod += b; div -= 1.0 }
    if (div != 0.0) {
      val fl = math.floor(div)
      if (div - fl > 0.5) fl + 1.0 else fl
    } else java.lang.Math.copySign(0.0, a / b)
  }

  /** strats.py:397-420. */
  def sell(date: Timestamp, price: Double, numShares: Double = -1d): Unit = {
    drainStopLosses(date)
    if (activeOrders > 0) sellFunctionality(numShares, date, price)
  }
}
