package graft.patterndb

import graft.template.Template
import graft.template.Template.{Func, Lit, Parsed, Ref}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Synthetic-message generation for patterndb `<action>` blocks — the
  * batch form of `/root/reference/modules/dbparser/synthetic-message.c`.
  *
  * Inherit modes (synthetic-message.c:178-205): `none` starts from an
  * empty message carrying only the triggering message's timestamp (plus
  * the context key's host/program/pid per scope), `last-message` copies
  * the triggering (= last) message, `context` additionally merges every
  * context member's values (log_msg_merge_context). The generated
  * message is virtually APPENDED to the context while the action's
  * value templates render (synthetic_message_generate_with_context
  * g_ptr_array_add before apply), so `$(context-length)` inside a value
  * renders n+1 while the action's `condition` sees n.
  */
object Synthetic {

  private def emptyMap = map().cast("map<string,string>")
  private def emptyTags = array().cast("array<string>")

  /** Rewrite `$(context-length)` nodes to a `$__context_length` ref so
    * the per-row compile can bind them to an aggregated column. */
  private def bindContextLength(p: Parsed): Parsed = Parsed(p.nodes.map {
    case Func("context-length", _, _) => Ref("__context_length", None)
    case Func(n, args, raw) => Func(n, args.map(bindContextLength), raw)
    case n => n
  })

  private def compileWith(text: String, columns: Set[String],
      ctxLen: Column): Column = {
    val resolve: String => Column = {
      case "__context_length" => ctxLen.cast("string")
      case name => graft.template.Macros.resolver(columns, None)(name)
    }
    Template.compile(bindContextLength(Template.parse(text)), resolve)
  }

  /** Generate one synthetic message per context.
    *
    * @param context classified LogRecord frame (host/program/pid/
    *        message/ts/values/tags columns)
    * @param key the correlation context key ([[graft.streaming.Correlate.contextKey]])
    * @param action the fired `<action>`
    * @param scope the rule's context-scope (None = no correlation
    *        context, like synthetic_message_generate_without_context)
    * @param order per-row ordering (the triggering message is the last)
    */
  def messages(context: DataFrame, key: Column, action: PdbAction,
      scope: Option[String] = None, order: Column = col("ts")): DataFrame = {
    val dataCols = Seq("host", "program", "pid", "message", "ts", "values", "tags")
    def src(f: String): Column =
      if (context.columns.contains(f)) col(f)
      else f match {
        case "values" => emptyMap
        case "tags" => emptyTags
        case "ts" => lit(null).cast("timestamp")
        case _ => lit(null).cast("string")
      }
    val w = context.withColumn("__k", key)
    val trig = struct(dataCols.map(f => src(f).as(f)): _*)
    val mergeCtx = aggregate(
      // comparator form: a struct carrying a map can't use natural
      // ordering, so sort on the order field alone
      array_sort(collect_list(struct(order.cast("double").as("o"),
        src("values").as("v"))),
        (a, b) => when(a.getField("o") < b.getField("o"), -1)
          .when(a.getField("o") > b.getField("o"), 1).otherwise(0)),
      emptyMap,
      (acc, e) => map_concat(
        map_filter(acc, (k, _) =>
          !array_contains(map_keys(e.getField("v")), k)),
        e.getField("v")))
    val agg = w.groupBy(col("__k")).agg(
      max_by(trig, order).as("__trig"),
      count(lit(1)).as("__n"),
      mergeCtx.as("__ctxvals"))

    def t(f: String): Column = col("__trig").getField(f)
    val mode = action.inheritProperties
    // none-mode keeps only the trigger timestamp + the key-scope
    // host/program/pid (synthetic_message_generate_with_context's
    // switch over the context scope)
    val scopeDepth = scope match {
      case None => 0
      case Some("global") => 0
      case Some("host") => 1
      case Some("program") => 2
      case _ => 3 // process
    }
    val base = agg
      .withColumn("ts", t("ts"))
      .withColumn("host",
        if (mode != "none" || scopeDepth >= 1) t("host")
        else lit(null).cast("string"))
      .withColumn("program",
        if (mode != "none" || scopeDepth >= 2) t("program")
        else lit(null).cast("string"))
      .withColumn("pid",
        if (mode != "none" || scopeDepth >= 3) t("pid")
        else lit(null).cast("string"))
      .withColumn("message",
        if (mode == "none") lit(null).cast("string") else t("message"))
      .withColumn("values", mode match {
        case "none" => emptyMap
        case "last-message" => t("values")
        case _ => col("__ctxvals")
      })
      .withColumn("tags", if (mode == "none") emptyTags else t("tags"))

    val cols = base.columns.toSet
    // condition sees the context length at fire time (__n) ...
    val kept = action.condition match {
      case None => base
      case Some(condText) =>
        val cond = graft.config.ConfigCompiler.filterColTemplated(
          graft.config.ConfigParser.parseFilterExpr(condText),
          s => compileWith(s, cols, col("__n")))
        base.filter(cond)
    }
    // ... while value templates see n+1 (the genmsg rides the context)
    val withValues = action.messageValues.foldLeft(kept) {
      case (df, (name, tmpl)) =>
        val v = compileWith(tmpl, cols, col("__n") + 1).cast("string")
        name match {
          case "MESSAGE" | "MSG" => df.withColumn("message", v)
          case "HOST" => df.withColumn("host", v)
          case "PROGRAM" => df.withColumn("program", v)
          case "PID" => df.withColumn("pid", v)
          case _ => df.withColumn("values", map_concat(
            map_filter(col("values"), (k, _) => k =!= name),
            map(lit(name), v)))
        }
    }
    val withTags =
      if (action.messageTags.isEmpty) withValues
      else withValues.withColumn("tags", array_union(col("tags"),
        array(action.messageTags.map(lit(_)): _*)))
    withTags.select(
      (Seq(col("__k").as("context_key")) ++ dataCols.map(col)): _*)
  }
}
