package graft.incremental

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-cursor operator (reference dlt/extract/incremental/
  * __init__.py:92-970, transforms transform.py:48-605, lag lag.py:15-121).
  *
  * Semantics preserved:
  *  - cursor column with last_value_func ∈ {max, min, custom};
  *  - closed/open range bounds (`rangeStart`/`rangeEnd`), `endValue`
  *    backfill windows (no state advance);
  *  - boundary dedup: rows equal to the stored boundary are fingerprinted
  *    (digest over pk values or the whole row, transform.py:104-117) and
  *    previously-seen fingerprints are dropped — exactly-once across
  *    overlapping windows;
  *  - lag: reopen the window by `lag` units — seconds for datetime
  *    cursors, days for dates, direct subtraction for numerics; string
  *    cursors are format-detected and re-rendered in their original
  *    format (lag.py:15-121). Lag never crosses `initialValue` and is
  *    deactivated by `endValue`, as in the reference;
  *  - on_cursor_value_missing ∈ raise | include | exclude.
  *
  * The filter is a plain pushdown-able predicate (reaches the parquet/JDBC
  * scan); boundary dedup is a fingerprint anti-join. Small fingerprint
  * sets ride the state file as literals; wide boundaries (a date cursor
  * can put millions of rows on one boundary value) use the table-backed
  * [[apply]] overload — a null-keyed equi anti-join that never collects
  * fingerprints to the driver.
  */
object Incremental {

  sealed trait LastValueFunc
  case object MaxFunc extends LastValueFunc
  case object MinFunc extends LastValueFunc
  /** Arbitrary last-value function (reference custom `last_value_func`,
    * incremental/__init__.py:163-187): `agg` reduces the cursor column to
    * the new last value; `accepts(last, cursor)` decides window
    * membership. Custom windows are inherently non-pushable and cannot
    * combine with `endValue` or `lag`. */
  final case class CustomFunc(agg: Column => Column,
      accepts: (Column, Column) => Column) extends LastValueFunc

  sealed trait OnMissing
  case object Raise extends OnMissing
  case object Include extends OnMissing
  case object Exclude extends OnMissing

  final case class Config(
      cursorColumn: String,
      lastValueFunc: LastValueFunc = MaxFunc,
      initialValue: Option[String] = None,
      endValue: Option[String] = None,
      /** fingerprint basis for boundary dedup; whole row when empty */
      primaryKey: Seq[String] = Nil,
      /** closed (>=) vs open (>) start; reference range_start, default closed
        * with dedup */
      closedStart: Boolean = true,
      /** lag in cursor units reopening the window: seconds (datetime),
        * days (date), direct value (numeric) — reference lag.py */
      lag: Option[Double] = None,
      onMissing: OnMissing = Raise)

  /** Cursor state persisted between runs (reference pipeline state,
    * incremental/__init__.py:423-462). */
  final case class State(lastValue: Option[String], boundaryHashes: Seq[String])
  object State { val empty: State = State(None, Nil) }

  private def fingerprint(cfg: Config, df: DataFrame): Column = {
    val basis = if (cfg.primaryKey.nonEmpty) cfg.primaryKey else df.columns.toSeq
    sha2(to_json(struct(basis.sorted.map(col): _*)), 256)
  }

  /** Resolve the cursor's type even for a nested path ("payload.ts" —
    * the reference's JSONPath cursor_path maps to struct field access). */
  private def cursorType(df: DataFrame, path: String) =
    df.select(col(path)).schema.head.dataType

  private def isCustom(cfg: Config) = cfg.lastValueFunc.isInstanceOf[CustomFunc]

  /** The effective window start: last value (lagged, clamped to
    * `initialValue`) or the initial value. Shared by the DataFrame
    * window and the JDBC WHERE pushdown so both open the same window. */
  def startValue(cfg: Config, state: State): Option[String] =
    (state.lastValue, cfg.lag, cfg.endValue) match {
      // lag applies to a stored last value only, never to initialValue,
      // and is deactivated during endValue backfills (lag.py:96-121)
      case (Some(v), Some(l), None) if !isCustom(cfg) =>
        val isMax = cfg.lastValueFunc == MaxFunc
        Some(Lag.clampToInitial(cfg.initialValue, Lag.applyLag(v, l, isMax), isMax))
      case (Some(v), _, _) => Some(v)
      case (None, _, _) => cfg.initialValue
    }

  /** Apply the incremental window + boundary dedup with fingerprints from
    * the driver-small state literal list. */
  def apply(df: DataFrame, cfg: Config, state: State): DataFrame =
    apply(df, cfg, state, None)

  /** Apply the incremental window + boundary dedup. `boundaryFps`, when
    * given, replaces the state's literal hash list with a fingerprint
    * table (single column `fp`) anti-joined against the boundary rows —
    * the scale path for wide boundaries. Returns the filtered frame;
    * call [[advance]] (or [[advanceValue]]+[[boundaryFingerprints]])
    * after a successful load. */
  def apply(df: DataFrame, cfg: Config, state: State,
      boundaryFps: Option[DataFrame]): DataFrame = {
    require(cfg.endValue.isEmpty || !isCustom(cfg),
      "endValue is unsupported with a custom last_value_func")
    val cursor = col(cfg.cursorColumn)
    val cmpLast: Option[Column] = startValue(cfg, state).map { last =>
      val bound = lit(last).cast(cursorType(df, cfg.cursorColumn))
      cfg.lastValueFunc match {
        case MaxFunc => if (cfg.closedStart) cursor >= bound else cursor > bound
        case MinFunc => if (cfg.closedStart) cursor <= bound else cursor < bound
        case CustomFunc(_, accepts) => accepts(bound, cursor)
      }
    }
    val cmpEnd: Option[Column] = cfg.endValue.map { end =>
      val bound = lit(end).cast(cursorType(df, cfg.cursorColumn))
      cfg.lastValueFunc match {
        case MinFunc => cursor > bound
        case _ => cursor < bound
      }
    }
    val window = (cmpLast.toSeq ++ cmpEnd.toSeq)
      .reduceOption(_ && _).getOrElse(lit(true))
    // Include/Exclude compile to plain conjunctions/disjunctions of
    // pushable atoms, so the window reaches the parquet/JDBC scan
    // (PushedFilters) — the property that makes incremental loads read
    // O(new data) instead of O(table). Raise must OBSERVE null cursors
    // to error on them, which is inherently incompatible with pruning
    // them at the scan; it keeps the non-pushable assert wrapper.
    val windowed = cfg.onMissing match {
      case Exclude => df.filter(cursor.isNotNull && window)
      case Include => df.filter(cursor.isNull || window)
      case Raise =>
        val raiseNull = assert_true(cursor.isNotNull,
          lit(s"cursor ${cfg.cursorColumn} is NULL")).isNull
        df.filter(when(cursor.isNull, raiseNull).otherwise(window))
    }

    // boundary dedup: only rows AT the stored boundary can be repeats
    if (!cfg.closedStart || cfg.lag.isDefined) windowed
    else (state.lastValue, boundaryFps) match {
      case (Some(last), Some(fps)) =>
        // scale path: fingerprint only boundary rows (conditional key —
        // sha2 is evaluated per row only when the cursor sits on the
        // boundary; null keys never match an equi-join, so off-boundary
        // rows always survive), anti-join the fingerprint table
        val bound = lit(last).cast(cursorType(df, cfg.cursorColumn))
        val keyed = windowed.withColumn("__graft_fp",
          when(cursor === bound, fingerprint(cfg, df)))
        keyed.join(fps.select(col("fp").as("__graft_fp")), Seq("__graft_fp"), "left_anti")
          .drop("__graft_fp")
      case (Some(last), None) if state.boundaryHashes.nonEmpty =>
        val bound = lit(last).cast(cursorType(df, cfg.cursorColumn))
        val fp = fingerprint(cfg, df)
        windowed.filter(cursor.isNull || cursor =!= bound ||
          !fp.isin(state.boundaryHashes: _*))
      case _ => windowed
    }
  }

  /** The new boundary value after a load (no fingerprint collection) —
    * pair with [[boundaryFingerprints]] for the table-backed path.
    * None when the window was empty; with `endValue` set (backfill)
    * state does not advance. */
  def advanceValue(processed: DataFrame, cfg: Config): Option[String] = {
    if (cfg.endValue.isDefined) return None
    val cursor = col(cfg.cursorColumn)
    val agg = cfg.lastValueFunc match {
      case MaxFunc => max(cursor)
      case MinFunc => min(cursor)
      case CustomFunc(f, _) => f(cursor)
    }
    val row = processed.filter(cursor.isNotNull).agg(agg.cast("string")).head()
    if (row.isNullAt(0)) None else Some(row.getString(0))
  }

  /** Fingerprints (column `fp`) of the rows sitting exactly on `last` —
    * the rows a re-delivery could duplicate. */
  def boundaryFingerprints(processed: DataFrame, cfg: Config,
      last: String): DataFrame = {
    val cursor = col(cfg.cursorColumn)
    val bound = lit(last).cast(cursorType(processed, cfg.cursorColumn))
    processed.filter(cursor === bound)
      .select(fingerprint(cfg, processed).as("fp")).distinct()
  }

  /** Compute the post-load state with DRIVER-COLLECTED boundary
    * fingerprints — fine for narrow boundaries (unique-ish cursors);
    * pipelines use the table-backed path instead. Runs two small
    * aggregations; with `endValue` set state does not advance. */
  def advance(processed: DataFrame, cfg: Config, previous: State): State =
    advanceValue(processed, cfg) match {
      case None => previous // backfill window or empty load
      case Some(newLast) =>
        val hashes = boundaryFingerprints(processed, cfg, newLast)
          .collect().map(_.getString(0)).toSeq
        val merged =
          if (previous.lastValue.contains(newLast))
            (previous.boundaryHashes ++ hashes).distinct
          else hashes
        State(Some(newLast), merged)
    }
}

/** Lag application for non-numeric cursors (reference lag.py:15-121):
  * format-detected, format-preserving, clamped to the initial value. */
private[incremental] object Lag {
  import java.time.{LocalDate, LocalDateTime}
  import java.time.format.DateTimeFormatter

  private val DateTimeRe =
    """^(\d{4}-\d{2}-\d{2})([T ])(\d{2}:\d{2}:\d{2})(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$""".r
  private val DateRe = """^\d{4}-\d{2}-\d{2}$""".r
  private val CompactDateRe = """^\d{8}$""".r
  private val Compact = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** Shift `value` by `lag` units opening the window (max → back,
    * min → forward): seconds for datetimes, days for dates, direct
    * subtraction for numerics. Unparseable values raise, as the
    * reference does. */
  def applyLag(value: String, lag: Double, isMax: Boolean): String = {
    val signed = if (isMax) -lag else lag
    value match {
      case DateTimeRe(d, sep, t, frac, zone) =>
        val base = LocalDateTime.parse(s"${d}T$t${Option(frac).getOrElse("")}")
        val shifted = base.plusNanos(math.round(signed * 1e9))
        val fracDigits = Option(frac).map(_.length - 1).getOrElse(0)
        render(shifted, sep, fracDigits) + Option(zone).getOrElse("")
      case DateRe() =>
        LocalDate.parse(value).plusDays(math.round(signed)).toString
      case CompactDateRe() =>
        LocalDate.parse(value, Compact).plusDays(math.round(signed)).format(Compact)
      case _ =>
        try (BigDecimal(value) + BigDecimal.decimal(signed))
          .underlying.stripTrailingZeros.toPlainString
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"lag is unsupported for cursor value '$value': " +
              "expected a number, date, or datetime (lag.py:45-50)")
        }
    }
  }

  /** Never let lag cross the initial value (reference apply_lag): for a
    * max window the start cannot move below it, for min not above. */
  def clampToInitial(initial: Option[String], lagged: String,
      isMax: Boolean): String = initial match {
    case Some(i) =>
      val c = cmp(lagged, i)
      if ((isMax && c < 0) || (!isMax && c > 0)) i else lagged
    case None => lagged
  }

  private def cmp(a: String, b: String): Int =
    try BigDecimal(a).compare(BigDecimal(b))
    catch { case _: NumberFormatException => a.compareTo(b) }

  private def render(dt: LocalDateTime, sep: String, fracDigits: Int): String = {
    val base = dt.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      .replace(" ", sep)
    if (fracDigits == 0) base
    else base + "." + f"${dt.getNano}%09d".take(fracDigits)
  }
}
