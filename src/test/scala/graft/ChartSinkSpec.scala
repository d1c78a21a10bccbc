package graft

import java.sql.Timestamp

import graft.viz.ChartSink

/** The SVG plot sink (reference strats.py:422-486 analogue): correct
  * coordinate scaling on known points, bounded Spark-side decimation
  * with endpoints preserved, one shape per series with a legend, the
  * reference's chart furniture (title, labels, watermark, dark style),
  * and well-formed XML output.
  */
class ChartSinkSpec extends SparkTestBase {
  import spark.implicits._

  private val polyline = """<polyline points="([^"]+)"""".r

  test("known points scale to the viewport corners") {
    val df = (0 to 10).map(i => ("s", i.toDouble, 2.0 * i))
      .toDF("ticker", "x", "y")
    val svg = ChartSink.lineChartSvg(df, "x", "y", "ticker",
      width = 960, height = 540)
    val pts = polyline.findFirstMatchIn(svg).get.group(1).split(" ")
      .map(_.split(",").map(_.toDouble))
    assert(pts.length == 11)
    // margins: left 70, right 20, top 45, bottom 50
    assert(math.abs(pts.head(0) - 70) < 0.2, "first x at plot left")
    assert(math.abs(pts.head(1) - (540 - 50)) < 0.2, "min y at plot bottom")
    assert(math.abs(pts.last(0) - (960 - 20)) < 0.2, "last x at plot right")
    assert(math.abs(pts.last(1) - 45) < 0.2, "max y at plot top")
    // monotone series stays monotone in screen space (y axis flips)
    assert(pts.sliding(2).forall(p => p(0)(0) < p(1)(0) && p(0)(1) > p(1)(1)))
  }

  test("decimation bounds the collect and keeps the endpoints") {
    val n = 10001
    val df = (0 until n).map(i => ("s", i.toDouble, math.sin(i / 50.0)))
      .toDF("ticker", "x", "y")
    val svg = ChartSink.lineChartSvg(df, "x", "y", "ticker",
      maxPointsPerSeries = 100)
    val pts = polyline.findFirstMatchIn(svg).get.group(1).split(" ")
    assert(pts.length <= 100, s"decimation bound violated: ${pts.length}")
    val dec = ChartSink.decimate(
      df.selectExpr("ticker as __s", "x as __x", "y as __y"),
      "__x", "__y", "__s", 100)
      .orderBy("__x").select("__x").as[Double].collect()
    assert(dec.head == 0.0 && dec.last == (n - 1).toDouble,
      "endpoints must survive decimation")
  }

  test("multi-series: one shape + legend entry per ticker; area mode") {
    val df = (Seq.tabulate(20)(i => ("AAPL", i.toDouble, 1.0 + i)) ++
      Seq.tabulate(20)(i => ("SPY", i.toDouble, 2.0 + i)))
      .toDF("ticker", "x", "y")
    val line = ChartSink.lineChartSvg(df, "x", "y", "ticker",
      watermark = Some("AAPL"), dark = true)
    assert(polyline.findAllIn(line).length == 2)
    assert(line.contains(">AAPL</text>") && line.contains(">SPY</text>"))
    assert(line.contains("fill-opacity=\"0.3\""), "watermark present")
    // reference dark .mplstyle: black axes facecolor, white watermark
    // text, faint (alpha 0.3) white grid
    assert(line.contains("#000000"), "dark plot-area face")
    assert(line.contains("stroke-opacity=\"0.3\""), "faint dark-mode grid")
    assert(line.contains("#1976d2"), "reference color cycle")
    val light = ChartSink.lineChartSvg(df, "x", "y", "ticker")
    assert(light.contains("#e4eef6"), "light plot-area tint")
    assert(light.contains("stroke-opacity=\"0.9\""), "strong light-mode grid")
    val areaSvg = ChartSink.lineChartSvg(df, "x", "y", "ticker", area = true)
    assert("<polygon".r.findAllIn(areaSvg).length == 2, "area polygons")
  }

  test("timestamp x-axis formats date ticks; output is well-formed XML") {
    val df = (1 to 5).map(i =>
      ("s", Timestamp.valueOf(f"2024-06-0$i 00:00:00"), i.toDouble))
      .toDF("ticker", "date", "nw")
    val svg = ChartSink.lineChartSvg(df, "date", "nw", "ticker",
      title = "Net Worth", xLabel = "Date", yLabel = "USD")
    assert(svg.contains("2024-06-01") && svg.contains("Net Worth"))
    val parsed = scala.xml.XML.loadString(svg)
    assert((parsed \\ "polyline").nonEmpty)
  }

  test("facade plotNetWorth: strategy + index series, ticker watermark") {
    val bars = (1 to 30).map { i =>
      ("AAPL", Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00"),
        100.0 + i + (if (i % 7 < 3) -4.0 else 4.0))
    }.toDF("ticker", "date", "close")
    val idx = (1 to 30).map(i =>
      (Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00"), 400.0 + i))
      .toDF("date", "SP500")
    val bt = new graft.api.Backtest(1000.0,
      graft.strategy.MACross(3, 8), bars, index = Some(idx))
    val out = java.nio.file.Files.createTempDirectory("graft_plot")
      .resolve("Graphs/aapl.svg")
    bt.plotNetWorth(out.toString, title = "AAPL Backtest")
    val svg = java.nio.file.Files.readString(out)
    assert(polyline.findAllIn(svg).length == 2, "strategy + index series")
    assert(svg.contains(">AAPL</text>") && svg.contains(">AAPL S&amp;P500</text>"))
    assert(svg.contains("font-variant=\"small-caps\""), "ticker watermark")
    assert(scala.xml.XML.loadString(svg).label == "svg")
  }

  test("price chart modes: PERCENT cumprods, LOG_PERCENT cumsums logs") {
    val bars = Seq(
      ("A", Timestamp.valueOf("2024-01-01 00:00:00"), 100.0),
      ("A", Timestamp.valueOf("2024-01-02 00:00:00"), 110.0),
      ("A", Timestamp.valueOf("2024-01-03 00:00:00"), 99.0))
      .toDF("ticker", "date", "close")
    val pct = ChartSink.priceChartSvg(bars, "PERCENT")
    assert(pct.contains("Percent Return"))
    // cumprod of (1.1, 0.9): last y = 0.99, first non-null = 1.1 —
    // the polyline's vertical extent must span exactly those two
    val pts = polyline.findFirstMatchIn(pct).get.group(1).split(" ")
      .map(_.split(",")(1).toDouble)
    assert(pts.length == 2, "first pct row is null and drops")
    assert(pts.min < pts.max)
    val logp = ChartSink.priceChartSvg(bars, "LOG_PERCENT", dark = true)
    assert(logp.contains("Log Percent Return") && logp.contains("#000000"))
    intercept[IllegalArgumentException] {
      ChartSink.priceChartSvg(bars, "CANDLESTICK")
    }
  }

  test("non-finite points drop; all-negative area keeps its baseline in-plot") {
    // a NaN or ±Infinity value (e.g. a -100% bar's log return) must not
    // poison the axis scaling — the point drops, the chart stays sane
    val df = Seq(
      ("A", 1.0, 1.0), ("A", 2.0, Double.NaN),
      ("A", 3.0, Double.NegativeInfinity), ("A", 4.0, 4.0))
      .toDF("ticker", "x", "y")
    val svg = ChartSink.lineChartSvg(df, "x", "y", "ticker")
    assert(!svg.contains("NaN") && !svg.contains("Infinity"), "finite only")
    val kept = polyline.findFirstMatchIn(svg).get.group(1).split(" ")
    assert(kept.length == 2, "exactly the two finite points survive")

    val neg = (0 to 10).map(i => ("s", i.toDouble, -5.0 + 0.3 * i))
      .toDF("ticker", "x", "y")
    val areaSvg = ChartSink.lineChartSvg(neg, "x", "y", "ticker", area = true)
    val poly = """<polygon points="([^"]+)"""".r
      .findFirstMatchIn(areaSvg).get.group(1).split(" ")
      .map(_.split(",")(1).toDouble)
    // every polygon y (baseline included) stays inside the plot region
    assert(poly.forall(y => y >= 45 - 0.5 && y <= 540 - 50 + 0.5),
      s"polygon escapes the plot: ${poly.min}..${poly.max}")
  }

  test("save writes under a created directory (Graphs/ convention)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_charts")
    val out = dir.resolve("Graphs/nw.svg").toString
    val df = (0 to 3).map(i => ("s", i.toDouble, i.toDouble))
      .toDF("ticker", "x", "y")
    ChartSink.save(df, "x", "y", "ticker", out)
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(out)) > 500)
  }
}
