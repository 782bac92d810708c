package graft.incremental

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-cursor operator (reference dlt/extract/incremental/
  * __init__.py:92-970, transforms transform.py:48-605, lag lag.py:15-121).
  *
  * Semantics preserved:
  *  - cursor column with last_value_func ∈ {max, min};
  *  - closed/open range bounds (`rangeStart`/`rangeEnd`), `endValue`
  *    backfill windows (no state advance);
  *  - boundary dedup: rows equal to the stored boundary are fingerprinted
  *    (digest over pk values or the whole row, transform.py:104-117) and
  *    previously-seen fingerprints are dropped — exactly-once across
  *    overlapping windows;
  *  - lag: reopen the window by `lag` units (attribution windows);
  *  - on_cursor_value_missing ∈ raise | include | exclude.
  *
  * The filter is a plain pushdown-able predicate (reaches the parquet/JDBC
  * scan); boundary dedup is a fingerprint anti-join against the handful of
  * rows sharing the boundary value — broadcast-sized by construction.
  */
object Incremental {

  sealed trait LastValueFunc
  case object MaxFunc extends LastValueFunc
  case object MinFunc extends LastValueFunc

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
      /** lag in cursor units (numeric cursors) reopening the window */
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

  /** Apply the incremental window + boundary dedup. Returns the filtered
    * frame; call [[advance]] after a successful load to get the new state.
    */
  def apply(df: DataFrame, cfg: Config, state: State): DataFrame = {
    val cursor = col(cfg.cursorColumn)
    val cmpLast: Option[Column] = effectiveStart(cfg, state).map { last =>
      val bound = lit(last).cast(cursorType(df, cfg.cursorColumn))
      cfg.lastValueFunc match {
        case MaxFunc => if (cfg.closedStart) cursor >= bound else cursor > bound
        case MinFunc => if (cfg.closedStart) cursor <= bound else cursor < bound
      }
    }
    val cmpEnd: Option[Column] = cfg.endValue.map { end =>
      val bound = lit(end).cast(cursorType(df, cfg.cursorColumn))
      cfg.lastValueFunc match {
        case MaxFunc => cursor < bound
        case MinFunc => cursor > bound
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
    (state.lastValue, state.boundaryHashes) match {
      case (Some(last), hashes) if hashes.nonEmpty && cfg.closedStart && cfg.lag.isEmpty =>
        val bound = lit(last).cast(cursorType(df, cfg.cursorColumn))
        val fp = fingerprint(cfg, df)
        windowed.filter(cursor.isNull || cursor =!= bound || !fp.isin(hashes: _*))
      case _ => windowed
    }
  }

  /** Start bound honoring lag (numeric cursors only, reference lag.py). */
  private def effectiveStart(cfg: Config, state: State): Option[String] = {
    val base = state.lastValue.orElse(cfg.initialValue)
    (base, cfg.lag) match {
      case (Some(v), Some(l)) =>
        try Some((BigDecimal(v) - l).underlying.stripTrailingZeros.toPlainString)
        catch { case _: NumberFormatException => Some(v) }
      case (b, _) => b
    }
  }

  /** Compute the post-load state: new boundary value + fingerprints of the
    * rows sitting exactly on it. Runs two small aggregations; with
    * `endValue` set (backfill) state does not advance (reference
    * __init__.py backfill semantics). */
  def advance(processed: DataFrame, cfg: Config, previous: State): State = {
    if (cfg.endValue.isDefined) return previous
    val cursor = col(cfg.cursorColumn)
    val agg = cfg.lastValueFunc match {
      case MaxFunc => max(cursor)
      case MinFunc => min(cursor)
    }
    val newLastRow = processed.filter(cursor.isNotNull).agg(agg.cast("string")).head()
    if (newLastRow.isNullAt(0)) previous
    else {
      val newLast = newLastRow.getString(0)
      val bound = lit(newLast).cast(cursorType(processed, cfg.cursorColumn))
      val hashes = processed.filter(cursor === bound)
        .select(fingerprint(cfg, processed).as("fp"))
        .distinct().collect().map(_.getString(0)).toSeq
      val merged =
        if (previous.lastValue.contains(newLast)) (previous.boundaryHashes ++ hashes).distinct
        else hashes
      State(Some(newLast), merged)
    }
  }
}
