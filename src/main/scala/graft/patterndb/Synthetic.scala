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
  *
  * Value templates here evaluate with the full correlation context
  * (log_template_format_with_context):
  *  - `${NAME}@N` message refs resolve against the Nth-from-last
  *    context member (eval.c:51-62; @0 = the virtually-appended
  *    genmsg during generation, the trigger during
  *    [[applyValues]]);
  *  - `$(grep cond $v...)` / `$(context-lookup ...)` iterate the
  *    context members (cond-funcs.c:75-145) — compiled as HOFs over
  *    the collected context array, with the condition's templates
  *    bound per element (filter PRIMITIVES like message() evaluate
  *    against the current element's fields);
  *  - `${CONTEXT_ID}` / `$_` render the rendered context-id
  *    (macros.c:630-634 reads options->context_id =
  *    context->key.session_id).
  */
object Synthetic {

  private def emptyMap = map().cast("map<string,string>")
  private def emptyTags = array().cast("array<string>")

  /** One compile environment: the collected context array (sorted by
    * the order column), the context length the CONDITION sees (`__n`),
    * and whether a genmsg is virtually appended (`genOffset` = 1 during
    * generation — value templates see length n+1 and `@0` resolves to
    * the message being built, i.e. the current row state). */
  private final case class Ctx(arr: Column, n: Column, genOffset: Int,
      contextId: Column, columns: Set[String])

  private def elemField(e: Column, name: String): Column = name match {
    case "MESSAGE" | "MSG" => e.getField("message")
    case "HOST" => e.getField("host")
    case "PROGRAM" => e.getField("program")
    case "PID" => e.getField("pid")
    case _ => element_at(e.getField("v"), name)
  }

  private def compileWith(text: String, ctx: Ctx): Column = {
    // pre-rewrite: context functions and @N refs become synthetic Ref
    // names the resolver below binds (the row-level Template compiler
    // has no context access)
    val greps = scala.collection.mutable.ArrayBuffer
      .empty[(String, Seq[Parsed], Seq[String], Int)]
    val funcRefs = scala.collection.mutable.ArrayBuffer.empty[Func]
    def rewrite(p: Parsed): Parsed = Parsed(p.nodes.map {
      case Func("context-length", _, _, 0) => Ref("__context_length", None)
      case Func(fn @ ("grep" | "context-lookup"), args, raw, mref) =>
        greps += ((fn, args, raw, mref))
        Ref(s"__grep ${greps.size - 1}", None)
      case f: Func if f.msgRef > 0 =>
        // `$(func ...)@N`: the reference stores msg_ref on FUNC elements
        // too (compiler.c:62) and evaluates the function against that
        // single context member (eval.c:97-103 passes &messages[msg_ndx],
        // num_messages=1) — ADVICE r10
        funcRefs += f
        Ref(s"__funcref ${funcRefs.size - 1}", None)
      case Func(n, args, raw, _) => Func(n, args.map(rewrite), raw)
      case Ref(name, d, r) if r > 0 =>
        Ref(s"__ctxref $r $name", d.map(rewrite))
      case n => n
    })
    val rewritten = rewrite(Template.parse(text))
    // a template compiled against ONE context element (grep condition /
    // value arguments): macros resolve to the element's fields
    def elemResolve(e: Column): String => Column = {
      case "CONTEXT_ID" | "_" => ctx.contextId
      case "__context_length" => ctx.n.cast("string")
      case name => elemField(e, name)
    }
    // the virtually-appended genmsg as a context-element-shaped struct
    // (the current row state), for single-member iteration over @0
    // during generation
    lazy val genElem: Column = struct(
      lit(0.0).as("o"),
      resolve("MESSAGE").cast("string").as("message"),
      resolve("HOST").cast("string").as("host"),
      resolve("PROGRAM").cast("string").as("program"),
      resolve("PID").cast("string").as("pid"),
      (if (ctx.columns.contains("values")) col("values")
       else emptyMap).as("v"))
    lazy val resolve: String => Column = {
      case "__context_length" => (ctx.n + ctx.genOffset).cast("string")
      case "CONTEXT_ID" | "_" => ctx.contextId
      case s if s.startsWith("__funcref ") =>
        // `$(func ...)@N` — the function sees a 1-message context: its
        // arg refs resolve against that member, $(context-length)
        // renders "1", refs deeper than the single member render "";
        // msg_ref > num_messages skips the whole element (eval.c:57)
        val f = funcRefs(s.split(" ", 2)(1).toInt)
        val idx = (ctx.n + lit(ctx.genOffset) - lit(f.msgRef) + lit(1))
          .cast("int")
        val member =
          if (ctx.genOffset == 0) element_at(ctx.arr, idx)
          else when(idx === ctx.n + 1, genElem)
            .otherwise(element_at(ctx.arr, idx))
        val memberResolve: String => Column = {
          case "CONTEXT_ID" | "_" => ctx.contextId
          case "__context_length" => lit("1")
          case name => elemField(member, name)
        }
        def strip(p: Parsed): Parsed = Parsed(p.nodes.map {
          case Ref(_, _, m) if m > 1 => Lit("") // beyond the 1-msg context
          case Ref(nm, d, _) => Ref(nm, d.map(strip), 0)
          case Func("context-length", _, _, _) =>
            Ref("__context_length", None)
          case Func(n2, a2, r2, _) => Func(n2, a2.map(strip), r2)
          case n => n
        })
        val compiled =
          if (f.name == "context-length") lit("1")
          else Template.compile(
            Parsed(Seq(Func(f.name, f.args.map(strip), f.rawArgs))),
            memberResolve)
        when(idx >= 1 && idx <= ctx.n + lit(ctx.genOffset), compiled)
          .otherwise(lit(""))
      case s if s.startsWith("__ctxref ") =>
        val Array(_, r, name) = s.split(" ", 3)
        // eval.c:59 msg_ndx = num_messages - msg_ref (0-based); the
        // virtual length includes the genmsg during generation, and
        // @0-at-generation IS the genmsg — the current row state
        val idx = (ctx.n + lit(ctx.genOffset) - lit(r.toInt) + lit(1)).cast("int")
        val fromCtx = elemField(element_at(ctx.arr, idx), name)
        if (ctx.genOffset == 0) when(idx >= 1 && idx <= ctx.n, fromCtx)
        else when(idx === ctx.n + 1, resolve(name))
          .when(idx >= 1 && idx <= ctx.n, fromCtx)
      case s if s.startsWith("__grep ") =>
        val (fn, args0, raw0, mref) = greps(s.split(" ", 2)(1).toInt)
        var maxCount: Option[Int] = None
        var (args, raw) = (args0, raw0)
        while (raw.headOption.exists(r => r == "-m" || r == "--max-count")) {
          maxCount = Some(raw(1).toInt)
          args = args.drop(2); raw = raw.drop(2)
        }
        val condText = {
          val t = raw.head.trim
          if (t.length >= 2 && (t.head == '\'' || t.head == '"') &&
              t.last == t.head) t.substring(1, t.length - 1) else t
        }
        // the condition's TEMPLATE comparisons bind per element; filter
        // primitives (message()/program() calls) would need per-element
        // field routing — out of scope here, the reference grep
        // conditions in the wild are template comparisons
        def cond(e: Column): Column =
          graft.config.ConfigCompiler.filterColTemplated(
            graft.config.ConfigParser.parseFilterExpr(condText),
            s2 => Template.compile(Template.parse(s2), elemResolve(e)))
        // `$(grep ...)@N` evaluates over a SINGLE-member context
        // (eval.c:97-98: &messages[msg_ndx], num_messages=1;
        // test_basicfuncs.c:163-165) — out-of-range refs iterate
        // nothing and render ""
        val iterArr = if (mref == 0) ctx.arr else {
          val idx = (ctx.n + lit(ctx.genOffset) - lit(mref) + lit(1)).cast("int")
          val single = filter(ctx.arr, (_, i) => i === idx - 1)
          if (ctx.genOffset == 0) single
          else when(idx === ctx.n + 1, array(genElem)).otherwise(single)
        }
        val matched = filter(iterArr, e => coalesce(cond(e), lit(false)))
        val limited = maxCount.map(m => slice(matched, 1, m)).getOrElse(matched)
        val vals = flatten(transform(limited, e =>
          array(args.tail.map(p =>
            Template.compile(p, elemResolve(e)).cast("string")): _*)))
        // tf_grep_call joins the RAW rendered values with a plain ','
        // (g_string_append_c(result, ',') — cond-funcs.c:133, no
        // list-repr quoting), so a matched value containing spaces or
        // commas passes through verbatim; $(context-lookup) str-repr
        // quotes each element (context-funcs.c:78) — ADVICE r10
        // an unset macro renders "" but keeps its position/delimiter
        // (cond-funcs.c:133) — matches Sessions.sortedValuesMulti
        if (fn == "grep")
          array_join(transform(vals, v => coalesce(v, lit(""))), ",")
        else graft.functions.ListFunctions.list_encode(
          filter(vals, _.isNotNull))
      case name => graft.template.Macros.resolver(ctx.columns, None)(name)
    }
    Template.compile(rewritten, resolve)
  }

  /** The rule's own `<values>`/`<tags>` applied to the TRIGGERING
    * message over its correlation context (`synthetic_message_apply`,
    * patterndb.c:643 — the trigger is already a context member, so
    * `$(context-length)` sees n and `@0` is the trigger itself).
    * Returns one row per context key: (context_key, values, tags) —
    * the trigger's values/tags after application. */
  def applyValues(context: DataFrame, key: Column,
      values: Seq[(String, String)], tags: Seq[String],
      contextId: Column = lit(null).cast("string"),
      order: Column = col("ts")): DataFrame = {
    val (agg, ctxOf) = aggregated(context, key, order, contextId)
    def t(f: String): Column = col("__trig").getField(f)
    val base = agg
      .withColumn("message", t("message"))
      .withColumn("host", t("host"))
      .withColumn("program", t("program"))
      .withColumn("pid", t("pid"))
      .withColumn("values", t("values"))
      .withColumn("tags", t("tags"))
    val ctx = ctxOf(base, 0)
    val withValues = values.foldLeft(base) { case (df, (name, tmpl)) =>
      // sequential application: a later template reading an earlier
      // name sees the already-set value (synthetic_message_apply loop)
      setNamed(df, name, compileWith(tmpl, ctx.copy(
        columns = df.columns.toSet)).cast("string"))
    }
    val withTags =
      if (tags.isEmpty) withValues
      else withValues.withColumn("tags",
        array_union(col("tags"), array(tags.map(lit(_)): _*)))
    withTags.select(col("__k").as("context_key"), col("message"),
      col("host"), col("program"), col("pid"), col("values"), col("tags"))
  }

  private def setNamed(df: DataFrame, name: String, v: Column): DataFrame =
    name match {
      case "MESSAGE" | "MSG" => df.withColumn("message", v)
      case "HOST" => df.withColumn("host", v)
      case "PROGRAM" => df.withColumn("program", v)
      case "PID" => df.withColumn("pid", v)
      case _ => df.withColumn("values", map_concat(
        map_filter(col("values"), (k, _) => k =!= name),
        map(lit(name), coalesce(v, lit("")))))
    }

  /** Group `context` by the correlation key: `__trig` (last member by
    * `order`), `__n` (context length), `__ctx` (the ordered member
    * array refs/greps read), `__ctxvals` (merge of every member's
    * values in order — log_msg_merge_context). Returns the aggregated
    * frame and a Ctx factory bound to it. */
  private def aggregated(context: DataFrame, key: Column, order: Column,
      contextId: Column): (DataFrame, (DataFrame, Int) => Ctx) = {
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
      .withColumn("__ctxid", contextId.cast("string"))
    val trig = struct(dataCols.map(f => src(f).as(f)): _*)
    val entry = struct(order.cast("double").as("o"),
      src("message").as("message"), src("host").as("host"),
      src("program").as("program"), src("pid").as("pid"),
      src("values").as("v"))
    // comparator form: a struct carrying a map can't use natural
    // ordering, so sort on the order field alone
    val ctxArr = array_sort(collect_list(entry),
      (a, b) => when(a.getField("o") < b.getField("o"), -1)
        .when(a.getField("o") > b.getField("o"), 1).otherwise(0))
    val agg = w.groupBy(col("__k")).agg(
      max_by(trig, order).as("__trig"),
      count(lit(1)).as("__n"),
      ctxArr.as("__ctx"),
      first(col("__ctxid")).as("__context_id"))
    val ctxOf = (df: DataFrame, genOffset: Int) => Ctx(col("__ctx"),
      col("__n"), genOffset, col("__context_id"), df.columns.toSet)
    (agg, ctxOf)
  }

  /** log_msg_merge_context: later members' values overwrite earlier
    * ones, derived from the collected `__ctx` array. */
  private def mergedCtxValues: Column =
    aggregate(col("__ctx"), emptyMap,
      (acc, e) => map_concat(
        map_filter(acc, (k, _) =>
          !array_contains(map_keys(e.getField("v")), k)),
        e.getField("v")))

  /** Generate one synthetic message per context.
    *
    * @param context classified LogRecord frame (host/program/pid/
    *        message/ts/values/tags columns)
    * @param key the correlation context key ([[graft.streaming.Correlate.contextKey]])
    * @param action the fired `<action>`
    * @param scope the rule's context-scope (None = no correlation
    *        context, like synthetic_message_generate_without_context)
    * @param order per-row ordering (the triggering message is the last)
    * @param contextId the RENDERED context-id (key.session_id) feeding
    *        `${CONTEXT_ID}` (macros.c:630)
    */
  def messages(context: DataFrame, key: Column, action: PdbAction,
      scope: Option[String] = None, order: Column = col("ts"),
      contextId: Column = lit(null).cast("string")): DataFrame = {
    val (agg, ctxOf) = aggregated(context, key, order, contextId)

    def t(f: String): Column = col("__trig").getField(f)
    val mode = action.inheritProperties
    // the condition evaluates against the CONTEXT — @0 = the trigger
    // with its full fields (filter_expr_eval_with_context runs BEFORE
    // any generation, patterndb.c:262-272) — so it filters a
    // trigger-shaped frame, NOT the mode-shaped genmsg base: under
    // inherit-properties=none the genmsg has no PID, but the
    // reference's `'${PID}' eq '999'` condition still sees the
    // trigger's 999 (test_patterndb.c:369 — the r10 battery port
    // caught the old order evaluating on the shaped base)
    val trigShaped = agg
      .withColumn("ts", t("ts"))
      .withColumn("host", t("host"))
      .withColumn("program", t("program"))
      .withColumn("pid", t("pid"))
      .withColumn("message", t("message"))
      .withColumn("values", t("values"))
      .withColumn("tags", t("tags"))
    val keptAgg = action.condition match {
      case None => trigShaped
      case Some(condText) =>
        val condCtx = ctxOf(trigShaped, 0)
        val cond = graft.config.ConfigCompiler.filterColTemplated(
          graft.config.ConfigParser.parseFilterExpr(condText),
          s => compileWith(s, condCtx))
        trigShaped.filter(cond)
    }
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
    val base = keptAgg
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
        case _ => mergedCtxValues
      })
      .withColumn("tags", if (mode == "none") emptyTags else t("tags"))

    // value templates see n+1 (the genmsg rides the context)
    val withValues = action.messageValues.foldLeft(base) {
      case (df, (name, tmpl)) =>
        setNamed(df, name,
          compileWith(tmpl, ctxOf(df, 1)).cast("string"))
    }
    val withTags =
      if (action.messageTags.isEmpty) withValues
      else withValues.withColumn("tags", array_union(col("tags"),
        array(action.messageTags.map(lit(_)): _*)))
    val dataCols = Seq("host", "program", "pid", "message", "ts", "values", "tags")
    withTags.select(
      (Seq(col("__k").as("context_key")) ++ dataCols.map(col)): _*)
  }
}
