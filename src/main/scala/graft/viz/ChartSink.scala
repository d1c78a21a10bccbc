package graft.viz

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampType, DateType}

/** SVG chart sink — the engine's analogue of the reference's matplotlib
  * plot sink (strats.py:422-486 `plot_data`: multi-series line or
  * unstacked-area chart of a date-indexed frame, title/axis labels,
  * legend, translucent ticker watermark, LIGHT/DARK styles, saved under
  * a target directory). Re-expressed Spark-first with zero external
  * dependencies: the chart is a generated standalone SVG string.
  *
  * Scale contract (the part matplotlib cannot do): a plot is a
  * driver-side materialization by nature, so the collect MUST be
  * bounded. Each series is decimated IN SPARK to at most
  * `maxPointsPerSeries` rows (every k-th row by x-order, endpoints
  * always kept — one window pass, no extra shuffle beyond the per-series
  * partitioning) before anything reaches the driver. Plotting a 100 TB
  * table collects ≤ series × maxPointsPerSeries points, never the data.
  */
object ChartSink {

  /** Style parity with the reference's .mplstyle files
    * (strat_backtest/graph_colors/stock-{light,dark}.mplstyle +
    * plot_data's text_color, finance_data.py:41-88): the same 6-color
    * cycle, the light style's tinted plot-area face (#e4eef6) with
    * strong white gridlines (alpha 0.9) vs the dark style's black face
    * with faint white grid (alpha 0.3), 1.5 pt series lines, 16 pt bold
    * title, left+bottom spines only (top/right off), black tick labels
    * in both modes (they sit in the white figure margin), white-framed
    * legend, and a watermark colored black (light) / white (dark).
    */
  final case class Style(dark: Boolean) {
    val background: String = "#ffffff" // figure facecolor (mpl default)
    val plotArea: String = if (dark) "#000000" else "#e4eef6"
    val grid: String = "#ffffff"
    val gridAlpha: Double = if (dark) 0.3 else 0.9
    val spine: String = if (dark) "#ffffff" else "#000000"
    val text: String = "#000000"
    val watermark: String = if (dark) "#ffffff" else "#000000"
    val legendFace: String = "#ffffff"
    val palette: Seq[String] = Seq("#1976d2", "#0097a7", "#388e3c",
      "#fbc02d", "#d32f2f", "#7b1fa2")
    val lineWidth: Double = 1.5
    val titleSize: Int = 16
  }

  /** Decimate each series to ≤ maxPoints rows by x-order: keep the first
    * row, the last row, and every ceil(n/maxPoints)-th in between —
    * shape-preserving enough for a line chart, and the collect bound.
    */
  private[graft] def decimate(df: DataFrame, xCol: String, yCol: String,
      seriesCol: String, maxPoints: Int): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    val w = Window.partitionBy(seriesCol).orderBy(col(xCol))
    val wAll = Window.partitionBy(seriesCol)
    // step = ceil((n-1)/(maxPoints-1)) keeps ≤ maxPoints rows INCLUDING
    // the forced endpoints: 1 + ceil((n-1)/step) ≤ maxPoints
    df.select(col(seriesCol), col(xCol), col(yCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__step", greatest(lit(1),
        ceil((col("__n") - 1).cast("double") / (maxPoints - 1))))
      .filter(col("__rn") === 1 || col("__rn") === col("__n") ||
        pmod(col("__rn") - 1, col("__step")) === 0)
      .drop("__rn", "__n", "__step")
  }

  private def fmtTick(v: Double, isTime: Boolean): String =
    if (isTime)
      java.time.Instant.ofEpochMilli((v / 1000d).toLong)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    else if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString
    else f"$v%.4g"

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Render a multi-series line (or unstacked-area) chart as a
    * standalone SVG string. `xCol` may be timestamp/date (ticks format
    * as UTC dates) or numeric; one polyline/polygon per distinct value
    * of `seriesCol`, drawn in x-order, legend in series-name order.
    */
  def lineChartSvg(df: DataFrame, xCol: String, yCol: String,
      seriesCol: String, title: String = "Stocks", xLabel: String = "Date",
      yLabel: String = "Return", watermark: Option[String] = None,
      dark: Boolean = false, area: Boolean = false,
      width: Int = 960, height: Int = 540,
      maxPointsPerSeries: Int = 2000): String = {
    val isTime = df.schema(xCol).dataType match {
      case TimestampType | DateType => true
      case _ => false
    }
    // DateType converts via its epoch DAY (timezone-free): casting a
    // date through the session timezone and formatting the instant in
    // UTC would shift every tick label a day back in positive-offset
    // zones. Timestamps are instants; ticks format in UTC (documented).
    val xNum = df.schema(xCol).dataType match {
      case DateType => unix_date(col(xCol)).cast("double") * 86400e6
      case TimestampType => unix_micros(col(xCol))
      case _ => col(xCol).cast("double")
    }
    // non-finite values (NaN pct_change on a 0/0 bar, -Inf log return)
    // poison the min/max scaling and every coordinate — drop them
    def finite(c: org.apache.spark.sql.Column) =
      c.isNotNull && !isnan(c) &&
        c =!= Double.PositiveInfinity && c =!= Double.NegativeInfinity
    val prepared = decimate(
      df.select(col(seriesCol).cast("string").as("__s"),
        xNum.cast("double").as("__x"), col(yCol).cast("double").as("__y"))
        .filter(finite(col("__x")) && finite(col("__y"))),
      "__x", "__y", "__s", maxPointsPerSeries)

    // bounded collect: ≤ series × maxPointsPerSeries rows by construction
    val rows = prepared.orderBy("__s", "__x").collect()
    require(rows.nonEmpty, "ChartSink: nothing to plot")
    val bySeries = rows.groupBy(_.getString(0)).toSeq.sortBy(_._1)
      .map { case (s, rs) =>
        s -> rs.map(r => (r.getDouble(1), r.getDouble(2))).sortBy(_._1) }

    val xs = rows.map(_.getDouble(1))
    val ys = rows.map(_.getDouble(2))
    val (xMin, xMax0) = (xs.min, xs.max)
    // area mode anchors its polygons at y=0, so the range must INCLUDE
    // 0 on both sides — an all-negative series would otherwise place
    // the baseline above the plot and fill across the title
    val (yMin0, yMax0) =
      if (area) (math.min(ys.min, 0.0), math.max(ys.max, 0.0))
      else (ys.min, ys.max)
    val xMax = if (xMax0 == xMin) xMin + 1 else xMax0
    val (yMin, yMax) = if (yMax0 == yMin0) (yMin0 - 1, yMax0 + 1)
      else (yMin0, yMax0)

    val (ml, mr, mt, mb) = (70, 20, 45, 50) // margins
    val (pw, ph) = (width - ml - mr, height - mt - mb)
    def sx(x: Double): Double = ml + (x - xMin) / (xMax - xMin) * pw
    def sy(y: Double): Double = mt + ph - (y - yMin) / (yMax - yMin) * ph

    val style = Style(dark)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">"""
    sb ++= s"""<rect width="$width" height="$height" fill="${style.background}"/>"""
    // the axes facecolor (reference axes.facecolor): grid and data draw
    // on top of this tinted/black plot-area rect
    sb ++= s"""<rect x="$ml" y="$mt" width="$pw" height="$ph" fill="${style.plotArea}"/>"""
    // grid + ticks (5 each axis, under the data like the reference's
    // ax.grid(zorder=0))
    val nTicks = 5
    (0 to nTicks).foreach { i =>
      val fx = xMin + (xMax - xMin) * i / nTicks
      val fy = yMin + (yMax - yMin) * i / nTicks
      val gx = sx(fx); val gy = sy(fy)
      sb ++= f"""<line x1="$gx%.1f" y1="$mt" x2="$gx%.1f" y2="${mt + ph}" stroke="${style.grid}" stroke-opacity="${style.gridAlpha}" stroke-width="1"/>"""
      sb ++= f"""<line x1="$ml" y1="$gy%.1f" x2="${ml + pw}" y2="$gy%.1f" stroke="${style.grid}" stroke-opacity="${style.gridAlpha}" stroke-width="1"/>"""
      sb ++= f"""<text x="$gx%.1f" y="${height - mb + 18}" font-size="11" fill="${style.text}" text-anchor="middle">${esc(fmtTick(fx, isTime))}</text>"""
      sb ++= f"""<text x="${ml - 8}" y="${gy + 4}%.1f" font-size="11" fill="${style.text}" text-anchor="end">${esc(fmtTick(fy, isTime = false))}</text>"""
    }
    // spines: left + bottom only (reference axes.spines.top/right: False)
    sb ++= s"""<line x1="$ml" y1="$mt" x2="$ml" y2="${mt + ph}" stroke="${style.spine}" stroke-width="1"/>"""
    sb ++= s"""<line x1="$ml" y1="${mt + ph}" x2="${ml + pw}" y2="${mt + ph}" stroke="${style.spine}" stroke-width="1"/>"""
    // watermark (the reference's big translucent ticker text, colored by
    // plot_data's text_color: black on light, white on dark)
    watermark.foreach { wm =>
      sb ++= s"""<text x="${width / 2}" y="${height / 2}" font-size="76" font-weight="bold" fill="${style.watermark}" fill-opacity="0.3" text-anchor="middle" font-variant="small-caps">${esc(wm)}</text>"""
    }
    // series
    bySeries.zipWithIndex.foreach { case ((name, pts), i) =>
      val color = style.palette(i % style.palette.size)
      val pointStr = pts.map { case (x, y) => f"${sx(x)}%.1f,${sy(y)}%.1f" }
        .mkString(" ")
      if (area) {
        val baseline = sy(math.max(yMin, 0.0))
        val poly = f"${sx(pts.head._1)}%.1f,$baseline%.1f $pointStr ${sx(pts.last._1)}%.1f,$baseline%.1f"
        sb ++= s"""<polygon points="$poly" fill="$color" fill-opacity="0.35" stroke="$color" stroke-width="${style.lineWidth}"/>"""
      } else {
        sb ++= s"""<polyline points="$pointStr" fill="none" stroke="$color" stroke-width="${style.lineWidth}"/>"""
      }
    }
    // legend (top-right, series-name order, white frame — reference
    // legend.frameon with legend.facecolor ffffff)
    if (bySeries.nonEmpty) {
      val lh = bySeries.size * 18 + 6
      sb ++= s"""<rect x="${width - mr - 138}" y="${mt - 4}" width="132" height="$lh" fill="${style.legendFace}" stroke="${style.spine}" stroke-width="0.5"/>"""
    }
    bySeries.zipWithIndex.foreach { case ((name, _), i) =>
      val color = style.palette(i % style.palette.size)
      val ly = mt + 8 + i * 18
      sb ++= s"""<rect x="${width - mr - 130}" y="${ly - 9}" width="12" height="12" fill="$color"/>"""
      sb ++= s"""<text x="${width - mr - 112}" y="$ly" font-size="12" fill="${style.text}">${esc(name)}</text>"""
    }
    // title + axis labels (reference axes.titlesize 16 bold)
    sb ++= s"""<text x="${width / 2}" y="26" font-size="${style.titleSize}" font-weight="bold" fill="${style.text}" text-anchor="middle">${esc(title)}</text>"""
    sb ++= s"""<text x="${width / 2}" y="${height - 12}" font-size="13" fill="${style.text}" text-anchor="middle">${esc(xLabel)}</text>"""
    sb ++= s"""<text x="18" y="${height / 2}" font-size="13" fill="${style.text}" text-anchor="middle" transform="rotate(-90 18 ${height / 2})">${esc(yLabel)}</text>"""
    sb ++= "</svg>"
    sb.toString
  }

  /** The reference's raw-price chart modes (finance_data.py:41-88
    * `plot_data`): REGULAR plots close, PERCENT plots
    * `cumprod(pct_change + 1)` (finance_data.py:29-39), LOG_PERCENT
    * plots `cumsum(log(pct_change + 1))` — the same per-ticker
    * transforms as the oracle-checked W2/W8/W9 window operators,
    * composed with the SVG sink. Returns the SVG string.
    */
  def priceChartSvg(bars: DataFrame, plotType: String = "REGULAR",
      tickerCol: String = "ticker", dateCol: String = "date",
      closeCol: String = "close", dark: Boolean = false,
      width: Int = 960, height: Int = 540,
      maxPointsPerSeries: Int = 2000): String = {
    import graft.ts.TimeSeriesOps
    val w = Window.partitionBy(col(tickerCol)).orderBy(col(dateCol))
    val close = col(closeCol).cast("double")
    val (value, title) = plotType match {
      case "REGULAR" => (close, "Stocks")
      case "PERCENT" =>
        (TimeSeriesOps.cumProd(TimeSeriesOps.pctChange(close, w) + 1, w),
          "Percent Return")
      case "LOG_PERCENT" =>
        (TimeSeriesOps.logCumReturn(close, w), "Log Percent Return")
      case other => throw new IllegalArgumentException(
        s"plotType must be REGULAR, PERCENT or LOG_PERCENT, got $other")
    }
    lineChartSvg(bars.select(col(tickerCol), col(dateCol),
        value.as("__value")),
      dateCol, "__value", tickerCol, title = title, xLabel = "Date",
      yLabel = if (plotType == "REGULAR") "Close" else "Return",
      dark = dark, width = width, height = height,
      maxPointsPerSeries = maxPointsPerSeries)
  }

  /** Render and write to `path` (parent directories created — the
    * reference's `Graphs/` convention).
    */
  def save(df: DataFrame, xCol: String, yCol: String, seriesCol: String,
      path: String, title: String = "Stocks", xLabel: String = "Date",
      yLabel: String = "Return", watermark: Option[String] = None,
      dark: Boolean = false, area: Boolean = false,
      width: Int = 960, height: Int = 540,
      maxPointsPerSeries: Int = 2000): Unit = {
    val svg = lineChartSvg(df, xCol, yCol, seriesCol, title, xLabel, yLabel,
      watermark, dark, area, width, height, maxPointsPerSeries)
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, svg)
  }
}
