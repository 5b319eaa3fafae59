package graft

import graft.patterndb._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Verbatim port of the reference's patterndb battery
  * (`/root/reference/modules/dbparser/tests/test_patterndb.c` +
  * fixtures from test_patterndb.h) — the correlation/action/rate-limit/
  * create-context state machine pinned case-for-case.
  *
  * The Spark engine's pieces under test: [[PdbLoader]] (XML + structural
  * validation), [[PdbMatcher]] (two-level radix classify incl.
  * program-pattern captures), [[Synthetic.applyValues]] /
  * [[Synthetic.messages]] (rule values + action messages over the
  * correlation context: `${CONTEXT_ID}`, `$(context-length)`,
  * `${NAME}@N` msg refs, `$(grep ...)`, inherit modes), and
  * [[graft.streaming.Correlate.rateLimitAdvance]] (the token bucket).
  * The HARNESS below supplies only the reference's sequential driver
  * glue (`pattern_db_process` / `pattern_db_advance_time`,
  * patterndb.c:578-676): context hash + timer wheel + emit buffer.
  */
class PatterndbBatterySpec extends GraftSuite {

  private val MYHOST = "MYHOST"
  private val MYPID = "999"
  private val T0 = 1700000000L

  /** A LogMessage stand-in; `values` covers NV pairs incl. the
    * `.classifier.*` handles, `tags` keeps insertion order (the TAGS
    * macro renders tag-registration order). */
  private case class BMsg(var host: String, var program: String,
      var pid: String, var message: String, ts: Long,
      var values: Map[String, String], var tags: Vector[String]) {
    def nv(name: String): String = name match {
      case "MESSAGE" | "MSG" => message
      case "HOST" => host
      case "PROGRAM" => program
      case "PID" => pid
      case "TAGS" => tags.mkString(",")
      case n => values.getOrElse(n, null)
    }
    def addTags(ts: Seq[String]): Unit =
      ts.foreach(t => if (!tags.contains(t)) tags = tags :+ t)
  }

  private def msg(program: String, message: String,
      nvName: String = null, nvValue: String = null): BMsg = {
    val vals = if (nvName == null) Map.empty[String, String]
      else Map(nvName -> nvValue)
    BMsg(MYHOST, program, MYPID, message, T0, vals, Vector.empty)
  }

  /** One correlation context (PDBContext): members in arrival order,
    * the rule that last matched into it, and its armed timer-wheel
    * entry (correlation.c keeps ctx->timer the same way). */
  private class Ctx(var rule: PdbRule,
      var timer: graft.streaming.TimerWheel.Entry[String]) {
    val members = scala.collection.mutable.ArrayBuffer.empty[BMsg]
    var contextId: String = null
  }

  /** The sequential driver (pattern_db_process semantics). */
  private class Pdb(xml: String) {
    val db: PdbDatabase = PdbLoader.loadDatabaseString(xml)
    assert(db.pubDate == "2010-02-22", "Invalid pubdate")
    val matcher = new PdbMatcher(db.rulesets)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[BMsg]
    private val contexts =
      scala.collection.mutable.LinkedHashMap.empty[String, Ctx]
    // (ruleId:actionIdx  corrKey) -> (lastCheck, buckets); a
    // SEPARATE hash from the contexts, so closing a context does not
    // refill its bucket (patterndb.c:211-224)
    private val rateLimits =
      scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    // the REAL timer wheel (graft.streaming.TimerWheel — the verbatim
    // timerwheel.c port): contexts arm entries, advanceTime ticks it,
    // expiry callbacks close contexts in (expiry, insertion) order
    private val timers = new graft.streaming.TimerWheel[String]
    private def wheel: Long = timers.now
    var programTemplate: Option[String] = None

    def forgetState(): Unit = {
      contexts.values.foreach(c => timers.delTimer(c.timer))
      contexts.clear(); rateLimits.clear(); emitted.clear()
    }

    /** Timer expiry = context close (pattern_db_expire_entry):
      * timeout actions fire against the LAST member, then removal. */
    private def onExpire(key: String): Unit =
      contexts.remove(key).foreach { c =>
        val trigger = c.members.last
        c.rule.actions.zipWithIndex.foreach { case (a, i) =>
          if (a.trigger == "timeout") executeAction(c.rule, i, a, trigger, Some(c))
        }
      }

    /** correlation_key_init (lib/correlation-key.h:29-39). */
    private def corrKey(scope: Option[String], m: BMsg, id: String): String = {
      def s(x: String) = Option(x).getOrElse("")
      scope.getOrElse("process") match {
        case "global" => id
        case "host" => s"${s(m.host)}$id"
        case "program" => s"${s(m.host)}${s(m.program)}$id"
        case _ => s"${s(m.host)}${s(m.program)}${s(m.pid)}$id"
      }
    }

    private def rowDf(members: Seq[BMsg]): DataFrame = {
      val rows = members.zipWithIndex.map { case (m, i) =>
        (m.host, m.program, m.pid, m.message, m.ts, m.values, m.tags, i)
      }
      import spark.implicits._
      rows.toDF("host", "program", "pid", "message", "__tsec", "values",
          "tags", "__ord")
        .withColumn("ts", timestamp_seconds(col("__tsec")))
        .drop("__tsec")
    }

    /** Row-level template render over one message (log_template_format). */
    private def renderRow(tmpl: String, m: BMsg): String = {
      val df = rowDf(Seq(m))
      val c = graft.template.Template.compile(
        graft.template.Template.parse(tmpl),
        graft.template.Macros.resolver(df.columns.toSet, None))
      Option(df.select(c.cast("string")).head.get(0))
        .map(_.toString).getOrElse("")
    }

    private def bmsgOf(r: Row, tsSec: Long): BMsg = BMsg(
      r.getAs[String]("host"), r.getAs[String]("program"),
      r.getAs[String]("pid"), r.getAs[String]("message"), tsSec,
      r.getAs[Map[String, String]]("values"),
      r.getAs[Seq[String]]("tags").toVector)

    /** _is_action_within_rate_limit — the shared engine bucket. */
    private def withinRate(rule: PdbRule, actionIdx: Int,
        action: PdbAction, m: BMsg, ctxId: String): Boolean =
      action.rate match {
        case None => true
        case Some((rate, quantum)) =>
          val key = corrKey(rule.contextScope, m, s"${rule.id}:$actionIdx")
          val (last, buckets) = rateLimits.getOrElse(key, (0L, 0L))
          val (nl, nb, ok) = graft.streaming.Correlate.rateLimitAdvance(
            last, buckets, wheel, rate, quantum)
          rateLimits(key) = (nl, nb)
          ok
      }

    /** Fire one action (match or timeout trigger already filtered).
      * `ctx` = the correlation context (None = simple rule). */
    private def executeAction(rule: PdbRule, actionIdx: Int,
        action: PdbAction, trigger: BMsg, ctx: Option[Ctx]): Unit = {
      val members = ctx.map(_.members.toSeq).getOrElse(Seq(trigger))
      val scope = if (ctx.isDefined) rule.contextScope else None
      val ctxId = ctx.flatMap(c => Option(c.contextId)).orNull
      // Synthetic.messages applies the action condition internally
      // (filter_expr_eval_with_context precedes generation); the rate
      // bucket is only consumed when the condition passed
      val genAction = action.createContext match {
        case None => action
        case Some(cc) => PdbAction(action.trigger, action.condition, None,
          cc.messageValues, cc.messageTags, cc.inheritProperties)
      }
      val out = Synthetic.messages(rowDf(members), lit("k"), genAction,
        scope, col("__ord"), lit(ctxId)).collect()
      if (out.isEmpty) return
      if (!withinRate(rule, actionIdx, action, trigger, ctxId)) return
      val genmsg = bmsgOf(out.head, trigger.ts)
      action.createContext match {
        case None => emitted += genmsg
        case Some(cc) =>
          // _execute_action_create_context: the genmsg SEEDS a new
          // context instead of being emitted; its key renders over the
          // GENMSG with the create-context's own scope; the timer uses
          // the RULE's timeout (patterndb.c:355 — quirk kept: the
          // syn_context timeout only reaches the debug log)
          val id = renderRow(cc.contextId, trigger)
          val key = corrKey(cc.contextScope, genmsg, id)
          val nc = new Ctx(rule,
            timers.addTimer(rule.contextTimeout.getOrElse(0).toLong,
              key)((_, k) => onExpire(k)))
          nc.contextId = id
          nc.members += genmsg
          contexts(key) = nc
      }
    }

    /** The C battery's `_advance_time` helper (test_patterndb.c:128-132:
      * `pattern_db_advance_time(db, timeout + 1)` → `set_time(now +
      * timeout + 1)`, patterndb.c:505-512). setTime's fire boundary is
      * STRICT, so this closes contexts with expiry <= now + timeout —
      * the previous harness scan (`expiresAt <= now + timeout + 1`)
      * over-fired by one tick at the exact boundary. */
    def advanceTime(timeout: Int): Unit = {
      if (timeout == 0) return
      timers.setTime(timers.now + timeout + 1)
    }

    /** pattern_db_process for one message; returns matched?. */
    def process(m: BMsg): Boolean = {
      // message time drives the wheel in ABSOLUTE epoch seconds — the
      // C's rl->last_check == 0 is its uninitialized sentinel, so the
      // wheel must never legitimately be 0 (real patterndb time is
      // wall-clock-seeded)
      timers.setTime(m.ts) // never backwards; due contexts would fire
      val program = programTemplate.map(renderRow(_, m)).getOrElse(m.program)
      matcher.classifyRule(program, m.message) match {
        case None =>
          emitted += m
          false
        case Some((rule, caps)) =>
          // pdb-ruleset.c:143-144 + the radix captures
          m.values = m.values ++ caps +
            (".classifier.class" -> (if (rule.ruleClass.nonEmpty) rule.ruleClass else "system")) +
            (".classifier.rule_id" -> rule.id)
          // correlation context (patterndb.c:586-640)
          val ctx: Option[Ctx] = rule.contextId.map { idTmpl =>
            val id = renderRow(idTmpl, m)
            m.values += (".classifier.context_id" -> id)
            val key = corrKey(rule.contextScope, m, id)
            // patterndb.c:617-626: an existing context re-arms its
            // timer (timer_wheel_mod_timer); a new one adds a fresh one
            val c = contexts.getOrElseUpdate(key, {
              val nc = new Ctx(rule, null); nc.contextId = id; nc
            })
            c.members += m
            val tmo = rule.contextTimeout.getOrElse(0).toLong
            c.timer =
              if (c.timer == null) timers.addTimer(tmo, key)((_, k) => onExpire(k))
              else timers.modTimer(c.timer, tmo)
            c.rule = rule
            c
          }
          // synthetic_message_apply of the rule's own values/tags (the
          // class tag is part of rule.msg — pdb-rule.c:38)
          val classTag = ".classifier." +
            (if (rule.ruleClass.nonEmpty) rule.ruleClass else "system")
          val members = ctx.map(_.members.toSeq).getOrElse(Seq(m))
          val applied = Synthetic.applyValues(rowDf(members), lit("k"),
            rule.values, Seq.empty,
            lit(ctx.flatMap(c => Option(c.contextId)).orNull),
            col("__ord")).collect()
          assert(applied.length == 1)
          val a = applied.head
          m.message = a.getAs[String]("message")
          m.values = a.getAs[Map[String, String]]("values")
          m.addTags(classTag +: rule.tags)
          // the ctx member IS this msg (the C appends the ref, so the
          // apply above is visible inside the context)
          emitted += m
          rule.actions.zipWithIndex.foreach { case (act, i) =>
            if (act.trigger == "match") executeAction(rule, i, act, m, ctx)
          }
          true
      }
    }
  }

  // ---- fixtures (test_patterndb.h, verbatim) -----------------------------

  private val pdbConflictingRulesWithDifferentParsers =
    """<patterndb version='4' pub_date='2010-02-22'>
 <ruleset name='testset' id='1'>
  <patterns><pattern>prog1</pattern><pattern>prog2</pattern></patterns>
  <rules>
    <rule provider='test' id='11' class='short'>
     <patterns><pattern>pattern @ESTRING:foo1: @</pattern></patterns>
    </rule>
    <rule provider='test' id='12' class='long'>
     <patterns><pattern>pattern @ESTRING:foo2: @tail</pattern></patterns>
    </rule>
  </rules>
 </ruleset>
</patterndb>"""

  private val pdbConflictingRulesWithTheSameParsers =
    pdbConflictingRulesWithDifferentParsers
      .replace("foo1", "foo").replace("foo2", "foo")

  private val pdbRuletestSkeleton =
    s"""<patterndb version='5' pub_date='2010-02-22'>
 <ruleset name='testset' id='1'>
  <description>This is a test set</description>
  <patterns><pattern>prog1</pattern><pattern>prog2</pattern></patterns>
  <rules>
    <rule provider='test' id='10' class='system' context-scope='program'>
     <patterns><pattern>simple-message</pattern></patterns>
     <tags><tag>simple-msg-tag1</tag><tag>simple-msg-tag2</tag></tags>
     <values>
      <value name='simple-msg-value-1'>value1</value>
      <value name='simple-msg-value-2'>value2</value>
      <value name='simple-msg-host'>$${HOST}</value>
     </values>
    </rule>
    <rule provider='test' id='10a' class='system' context-scope='program' context-id='$$PID' context-timeout='60'>
     <patterns><pattern>correlated-message-based-on-pid</pattern></patterns>
     <values>
      <value name='correlated-msg-context-id'>$${CONTEXT_ID}</value>
      <value name='correlated-msg-context-length'>$$(context-length)</value>
     </values>
    </rule>
    <rule provider='test' id='10b' class='violation' context-scope='program' context-id='$$PID' context-timeout='60'>
     <patterns><pattern>correlated-message-with-action-on-match</pattern></patterns>
     <actions>
       <action trigger='match'>
         <message>
           <values>
             <value name='MESSAGE'>generated-message-on-match</value>
             <value name='context-id'>$${CONTEXT_ID}</value>
           </values>
           <tags><tag>correlated-msg-tag</tag></tags>
         </message>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='10c' class='violation' context-scope='program' context-id='$$PID' context-timeout='60'>
     <patterns><pattern>correlated-message-with-action-on-timeout</pattern></patterns>
     <actions>
       <action trigger='timeout'>
         <message><values><value name='MESSAGE'>generated-message-on-timeout</value></values></message>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='10d' class='violation' context-scope='program' context-id='$$PID' context-timeout='60'>
     <patterns><pattern>correlated-message-with-action-condition</pattern></patterns>
     <actions>
       <action trigger='match' condition='"$${PID}" ne "$MYPID"'>
         <message><values><value name='MESSAGE'>not-generated-message</value></values></message>
       </action>
       <action trigger='match' condition='"$${PID}" eq "$MYPID"'>
         <message><values><value name='MESSAGE'>generated-message-on-condition</value></values></message>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='10e' class='violation' context-scope='program' context-id='$$PID' context-timeout='60'>
     <patterns><pattern>correlated-message-with-rate-limited-action</pattern></patterns>
     <actions>
       <action trigger='match' rate='1/60'>
         <message><values><value name='MESSAGE'>generated-message-rate-limit</value></values></message>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='10f' class='violation' context-scope='program' context-id='$$PROGRAM' context-timeout='60'>
     <patterns><pattern>correlated-message-with-action-condition-filter</pattern></patterns>
     <actions>
       <action trigger='match' condition='message("filter-not-exists" type(pcre))'>
         <message><values><value name='MESSAGE'>not-generated-message</value></values></message>
       </action>
       <action trigger='match' condition='message("filter" type(pcre))'>
         <message><values><value name='MESSAGE'>generated-message-on-condition</value></values></message>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='11b' class='violation'>
     <patterns><pattern>simple-message-with-action-on-match</pattern></patterns>
     <actions>
       <action trigger='match'>
         <message>
           <values>
             <value name='MESSAGE'>generated-message-on-match</value>
             <value name='context-id'>$${CONTEXT_ID}</value>
           </values>
           <tags><tag>simple-msg-tag</tag></tags>
         </message>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='11d' class='violation'>
     <patterns><pattern>simple-message-with-action-condition</pattern></patterns>
     <actions>
       <action trigger='match' condition='"$${PID}" ne "$MYPID"'>
         <message><values><value name='MESSAGE'>not-generated-message</value></values></message>
       </action>
       <action trigger='match' condition='"$${PID}" eq "$MYPID"'>
         <message><values><value name='MESSAGE'>generated-message-on-condition</value></values></message>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='11e' class='violation'>
     <patterns><pattern>simple-message-with-rate-limited-action</pattern></patterns>
     <actions>
       <action trigger='match' rate='1/60'>
         <message><values><value name='MESSAGE'>generated-message-rate-limit</value></values></message>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='12' class='violation'>
     <patterns><pattern>simple-message-with-action-to-create-context</pattern></patterns>
     <actions>
       <action trigger='match'>
         <create-context context-id='1000' context-timeout='60' context-scope='program'>
           <message inherit-properties='context'>
             <values><value name='MESSAGE'>context message</value></values>
           </message>
         </create-context>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='13' class='violation' context-id='1000' context-timeout='60' context-scope='program'>
     <patterns><pattern>correlated-message-that-uses-context-created-by-rule-id#12</pattern></patterns>
     <values>
       <value name='triggering-message'>$${MESSAGE}@1 assd</value>
     </values>
    </rule>
    <rule provider='test' id='14' class='violation' context-id='1001' context-timeout='60' context-scope='program'>
     <patterns><pattern>correlated-message-with-action-to-create-context</pattern></patterns>
     <values>
       <value name='rule-msg-context-id'>$${.classifier.context_id}</value>
     </values>
     <actions>
       <action trigger='match'>
         <create-context context-id='1002' context-timeout='60' context-scope='program'>
           <message inherit-properties='context'>
             <values><value name='MESSAGE'>context message $${rule-msg-context-id}</value></values>
           </message>
         </create-context>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='15' class='violation' context-id='1002' context-timeout='60' context-scope='program'>
     <patterns><pattern>correlated-message-that-uses-context-created-by-rule-id#14</pattern></patterns>
     <values>
       <value name='triggering-message'>$${MESSAGE}@1 assd</value>
       <value name='triggering-message-context-id'>$$(grep ('$${rule-msg-context-id}' ne '') $${rule-msg-context-id})</value>
     </values>
    </rule>
  </rules>
 </ruleset>
</patterndb>"""

  private val pdbCompleteSyntax =
    """<patterndb version='5' pub_date='2010-02-22'>
 <ruleset name='testset' id='1'>
  <url>http://foobar.org/</url>
  <urls><url>http://foobar.org/1</url><url>http://foobar.org/2</url></urls>
  <description>This is a test set</description>
  <patterns><pattern>prog2</pattern><pattern>prog3</pattern></patterns>
  <pattern>prog1</pattern>
  <rules>
    <rule provider='test' id='10' class='system' context-id='foobar' context-scope='program'>
     <description>This is a rule description</description>
     <urls><url>http://foobar.org/1</url><url>http://foobar.org/2</url></urls>
     <patterns>
      <pattern>simple-message</pattern>
      <pattern>simple-message-alternative</pattern>
     </patterns>
     <tags><tag>simple-msg-tag1</tag><tag>simple-msg-tag2</tag></tags>
     <values>
      <value name='simple-msg-value-1'>value1</value>
      <value name='simple-msg-value-2'>value2</value>
      <value name='simple-msg-host'>${HOST}</value>
     </values>
     <examples>
       <example>
         <test_message program='foobar'>This is foobar message</test_message>
         <test_values>
           <test_value name='foo'>foo</test_value>
           <test_value name='bar'>bar</test_value>
         </test_values>
       </example>
     </examples>
     <actions>
       <action>
         <message>
           <values><value name='FOO'>foo</value><value name='BAR'>bar</value></values>
           <tags><tag>tag1</tag><tag>tag2</tag></tags>
         </message>
       </action>
       <action>
         <create-context context-id='foobar'>
           <message>
             <values><value name='FOO'>foo</value><value name='BAR'>bar</value></values>
             <tags><tag>tag1</tag><tag>tag2</tag></tags>
           </message>
         </create-context>
       </action>
     </actions>
    </rule>
  </rules>
</ruleset>
</patterndb>"""

  private def inheritanceSkeleton(mode: String, id: String, pat: String) =
    s"""<patterndb version='4' pub_date='2010-02-22'>
  <ruleset name='testset' id='1'>
    <patterns><pattern>prog2</pattern></patterns>
    <rules>
      <rule provider='test' id='$id' class='system'>
        <patterns><pattern>$pat</pattern></patterns>
        <tags><tag>basetag1</tag><tag>basetag2</tag></tags>
        <actions>
          <action trigger='match'>
            <message inherit-properties='$mode'>
              <values><value name='actionkey'>actionvalue</value></values>
              <tags><tag>actiontag</tag></tags>
            </message>
          </action>
        </actions>
      </rule>
    </rules>
  </ruleset>
</patterndb>"""

  private val pdbInheritanceContextSkeleton =
    s"""<patterndb version='4' pub_date='2010-02-22'>
  <ruleset name='testset' id='1'>
    <patterns><pattern>prog2</pattern></patterns>
    <rules>
      <rule provider='test' id='11' class='system' context-scope='program' context-id='$$PID' context-timeout='60'>
        <patterns><pattern>pattern-with-inheritance-context</pattern></patterns>
        <tags><tag>basetag1</tag><tag>basetag2</tag></tags>
        <actions>
          <action trigger='timeout'>
            <message inherit-properties='context'>
              <values><value name='MESSAGE'>action message</value></values>
              <tags><tag>actiontag</tag></tags>
            </message>
          </action>
        </actions>
     </rule>
    </rules>
  </ruleset>
</patterndb>"""

  private val pdbMsgCountSkeleton =
    s"""<patterndb version='4' pub_date='2010-02-22'>
 <ruleset name='testset' id='1'>
  <patterns><pattern>prog1</pattern><pattern>prog2</pattern></patterns>
  <rules>
    <rule provider='test' id='13' class='system' context-scope='program' context-id='$$PID' context-timeout='60'>
      <patterns><pattern>pattern13</pattern></patterns>
      <values><value name='n13-1'>v13-1</value></values>
      <actions>
        <action condition='"$${n13-1}" eq "v13-1"' trigger='match'>
          <message inherit-properties='TRUE'>
            <values><value name='CONTEXT_LENGTH'>$$(context-length)</value></values>
          </message>
        </action>
      </actions>
    </rule>
    <rule provider='test' id='14' class='system' context-scope='program' context-id='$$PID' context-timeout='60'>
      <patterns><pattern>pattern14</pattern></patterns>
      <actions>
        <action condition='"$$(context-length)" eq "1"' trigger='match'>
          <message inherit-properties='TRUE'>
            <values><value name='CONTEXT_LENGTH'>$$(context-length)</value></values>
          </message>
        </action>
      </actions>
    </rule>
    <rule provider='test' id='15' class='system' context-scope='program' context-id='$$PID' context-timeout='60'>
      <patterns><pattern>pattern15@ANYSTRING:p15@</pattern></patterns>
      <actions>
        <action condition='"$$(context-length)" eq "2"' trigger='match'>
          <message inherit-properties='FALSE'>
            <values><value name='fired'>true</value></values>
          </message>
        </action>
      </actions>
    </rule>
  </rules>
 </ruleset>
</patterndb>"""

  private val pdbTagOutsideOfRuleSkeleton =
    """<patterndb version='3' pub_date='2010-02-22'>
 <ruleset name='testset' id='1'>
  <patterns><pattern>prog1</pattern></patterns>
  <tags><tag>tag1</tag></tags>
 </ruleset>
</patterndb>"""

  private val pdbTestMatchInProgram =
    """<patterndb version='5' pub_date='2010-02-22'>
<ruleset name='sshd' id='1'>
<patterns><pattern>sshd @NUMBER:num@</pattern></patterns>
<rules>
  <rule id='12347598' class='sshd' provider='batman'>
     <patterns><pattern>almafa</pattern></patterns>
  </rule>
</rules>
</ruleset>
</patterndb>"""

  private val pdbTestProgramTemplate =
    """<patterndb version='5' pub_date='2010-02-22'>
<ruleset name='sshd' id='1'>
<patterns><pattern>sshd @NUMBER:num@</pattern></patterns>
<rules>
  <rule id='12347598' class='sshd' provider='batman'>
     <patterns><pattern>almafa @STRING:str@</pattern></patterns>
  </rule>
</rules>
</ruleset>
</patterndb>"""

  // ---- assertion helpers (test_patterndb.c:163-289) -----------------------

  private def assertMatchesAndNv(p: Pdb, pattern: String, name: String,
      value: String, program: String = "prog1"): BMsg = {
    val m = msg(program, pattern)
    assert(p.process(m), s"patterndb expected to match: $pattern")
    assert(m.nv(name) == value,
      s"$name: expected '$value', got '${m.nv(name)}'")
    m
  }

  private def assertMatchesAndHasTag(p: Pdb, pattern: String, tag: String,
      set: Boolean): Unit = {
    val m = msg("prog1", pattern)
    assert(p.process(m))
    assert(m.tags.contains(tag) == set, s"tag $tag set=${!set}: ${m.tags}")
  }

  private def outNv(p: Pdb, ndx: Int, name: String, value: String): Unit = {
    assert(ndx < p.emitted.length,
      s"expected the $ndx. message, got only ${p.emitted.length}")
    assert(p.emitted(ndx).nv(name) == value,
      s"output[$ndx].$name: expected '$value', got '${p.emitted(ndx).nv(name)}'")
  }

  private def outTag(p: Pdb, ndx: Int, tag: String, set: Boolean): Unit =
    assert(p.emitted(ndx).tags.contains(tag) == set,
      s"output[$ndx] tag $tag: ${p.emitted(ndx).tags}")

  // ---- the battery ---------------------------------------------------------

  test("test_simple_rule_without_context_or_actions (:291)") {
    val p = new Pdb(pdbRuletestSkeleton)
    assertMatchesAndHasTag(p, "simple-message", ".classifier.system", set = true)
    p.forgetState()
    assertMatchesAndNv(p, "simple-message", "TAGS",
      ".classifier.system,simple-msg-tag1,simple-msg-tag2")
    p.forgetState()
    assertMatchesAndNv(p, "simple-message", "simple-msg-value-1", "value1")
    p.forgetState()
    assertMatchesAndNv(p, "simple-message", "simple-msg-value-2", "value2")
    p.forgetState()
    assertMatchesAndNv(p, "simple-message", "simple-msg-host", MYHOST)
  }

  test("test_correlation_rule_without_actions (:311)") {
    val p = new Pdb(pdbRuletestSkeleton)
    assertMatchesAndHasTag(p, "correlated-message-based-on-pid", ".classifier.system", set = true)
    p.forgetState()
    assertMatchesAndNv(p, "correlated-message-based-on-pid",
      "correlated-msg-context-id", MYPID)
    p.forgetState()
    assertMatchesAndNv(p, "correlated-message-based-on-pid",
      "correlated-msg-context-length", "1")
    // keep state: the context grows across messages
    assertMatchesAndNv(p, "correlated-message-based-on-pid",
      "correlated-msg-context-length", "2")
    assertMatchesAndNv(p, "correlated-message-based-on-pid",
      "correlated-msg-context-length", "3")
  }

  test("test_correlation_rule_with_action_on_match (:333)") {
    val p = new Pdb(pdbRuletestSkeleton)
    assertMatchesAndHasTag(p, "correlated-message-with-action-on-match",
      ".classifier.violation", set = true)
    p.forgetState()
    p.process(msg("prog2", "correlated-message-with-action-on-match"))
    outNv(p, 1, "MESSAGE", "generated-message-on-match")
    outNv(p, 1, "context-id", "999")
    outTag(p, 1, "correlated-msg-tag", set = true)
  }

  test("test_correlation_rule_with_action_on_timeout (:353)") {
    val p = new Pdb(pdbRuletestSkeleton)
    assertMatchesAndHasTag(p, "correlated-message-with-action-on-timeout",
      ".classifier.violation", set = true)
    p.forgetState()
    p.process(msg("prog2", "correlated-message-with-action-on-timeout"))
    p.advanceTime(60)
    outNv(p, 1, "MESSAGE", "generated-message-on-timeout")
  }

  test("test_correlation_rule_with_action_condition (:369)") {
    val p = new Pdb(pdbRuletestSkeleton)
    assertMatchesAndHasTag(p, "correlated-message-with-action-condition",
      ".classifier.violation", set = true)
    p.forgetState()
    p.process(msg("prog2", "correlated-message-with-action-condition"))
    outNv(p, 1, "MESSAGE", "generated-message-on-condition")
  }

  test("test_correlation_rule_with_action_condition_filter (:385)") {
    val p = new Pdb(pdbRuletestSkeleton)
    assertMatchesAndHasTag(p, "correlated-message-with-action-condition",
      ".classifier.violation", set = true)
    p.forgetState()
    p.process(msg("prog2", "correlated-message-with-action-condition-filter"))
    outNv(p, 1, "MESSAGE", "generated-message-on-condition")
  }

  test("test_correlation_rule_with_rate_limited_action (:401)") {
    val p = new Pdb(pdbRuletestSkeleton)
    assertMatchesAndHasTag(p, "correlated-message-with-rate-limited-action",
      ".classifier.violation", set = true)
    p.forgetState()
    // [0] trigger [1] GENERATED [2] trigger [3] trigger [4] trigger
    // [5] GENERATED (after advance refills the bucket)
    p.process(msg("prog2", "correlated-message-with-rate-limited-action"))
    outNv(p, 1, "MESSAGE", "generated-message-rate-limit")
    p.process(msg("prog2", "correlated-message-with-rate-limited-action"))
    assert(p.emitted.length <= 3, s"unexpected message at 3")
    p.process(msg("prog2", "correlated-message-with-rate-limited-action"))
    assert(p.emitted.length <= 4, s"unexpected message at 4")
    p.advanceTime(120)
    p.process(msg("prog2", "correlated-message-with-rate-limited-action"))
    outNv(p, 5, "MESSAGE", "generated-message-rate-limit")
  }

  test("test_simple_rule_with_action_on_match (:435)") {
    val p = new Pdb(pdbRuletestSkeleton)
    assertMatchesAndHasTag(p, "simple-message-with-action-on-match",
      ".classifier.violation", set = true)
    p.forgetState()
    p.process(msg("prog2", "simple-message-with-action-on-match"))
    outNv(p, 1, "MESSAGE", "generated-message-on-match")
    outTag(p, 1, "simple-msg-tag", set = true)
  }

  test("test_simple_rule_with_rate_limited_action (:452)") {
    val p = new Pdb(pdbRuletestSkeleton)
    assertMatchesAndHasTag(p, "simple-message-with-rate-limited-action",
      ".classifier.violation", set = true)
    p.forgetState()
    p.process(msg("prog2", "simple-message-with-rate-limited-action"))
    outNv(p, 1, "MESSAGE", "generated-message-rate-limit")
    p.process(msg("prog2", "simple-message-with-rate-limited-action"))
    assert(p.emitted.length <= 3)
    p.process(msg("prog2", "simple-message-with-rate-limited-action"))
    assert(p.emitted.length <= 4)
    p.advanceTime(120)
    p.process(msg("prog2", "simple-message-with-rate-limited-action"))
    outNv(p, 5, "MESSAGE", "generated-message-rate-limit")
  }

  test("test_simple_rule_with_action_condition (:483)") {
    val p = new Pdb(pdbRuletestSkeleton)
    assertMatchesAndHasTag(p, "simple-message-with-action-condition",
      ".classifier.violation", set = true)
    p.forgetState()
    p.process(msg("prog2", "simple-message-with-action-condition"))
    outNv(p, 1, "MESSAGE", "generated-message-on-condition")
  }

  test("test_correlation_rule_with_create_context (:498)") {
    val p = new Pdb(pdbRuletestSkeleton)
    assertMatchesAndNv(p, "simple-message-with-action-to-create-context",
      ".classifier.rule_id", "12")
    assertMatchesAndNv(p, "correlated-message-that-uses-context-created-by-rule-id#12",
      "triggering-message", "context message assd")
    assertMatchesAndNv(p, "correlated-message-that-uses-context-created-by-rule-id#12",
      "PROGRAM", "prog1")

    assertMatchesAndNv(p, "correlated-message-with-action-to-create-context",
      ".classifier.rule_id", "14")
    assertMatchesAndNv(p, "correlated-message-that-uses-context-created-by-rule-id#14",
      "triggering-message", "context message 1001 assd")
    assertMatchesAndNv(p, "correlated-message-that-uses-context-created-by-rule-id#14",
      "PROGRAM", "prog1")
    assertMatchesAndNv(p, "correlated-message-that-uses-context-created-by-rule-id#14",
      "triggering-message-context-id", "1001")
  }

  test("test_patterndb_loads_a_syntactically_complete_xml_properly (:529)") {
    val p = new Pdb(pdbCompleteSyntax)
    assertMatchesAndHasTag(p, "simple-message", ".classifier.system", set = true)
  }

  test("pdbtest_patterndb_message_property_inheritance_enabled (:539)") {
    val p = new Pdb(inheritanceSkeleton("TRUE", "11", "pattern-with-inheritance-enabled"))
    p.process(msg("prog2", "pattern-with-inheritance-enabled"))
    outNv(p, 1, "MESSAGE", "pattern-with-inheritance-enabled")
    outTag(p, 1, "basetag1", set = true)
    outTag(p, 1, "basetag2", set = true)
    outTag(p, 1, "actiontag", set = true)
    outNv(p, 1, "actionkey", "actionvalue")
  }

  test("test_patterndb_message_property_inheritance_disabled (:555)") {
    val p = new Pdb(inheritanceSkeleton("FALSE", "12", "pattern-with-inheritance-disabled"))
    p.process(msg("prog2", "pattern-with-inheritance-disabled"))
    outNv(p, 1, "MESSAGE", null)
    outTag(p, 1, "basetag1", set = false)
    outTag(p, 1, "basetag2", set = false)
    outTag(p, 1, "actiontag", set = true)
    outNv(p, 1, "actionkey", "actionvalue")
  }

  test("test_patterndb_message_property_inheritance_context (:571)") {
    val p = new Pdb(pdbInheritanceContextSkeleton)
    assert(p.process(msg("prog2", "pattern-with-inheritance-context",
      "merged1", "merged1")))
    assert(p.process(msg("prog2", "pattern-with-inheritance-context",
      "merged2", "merged2")))
    p.advanceTime(60)
    outNv(p, 2, "MESSAGE", "action message")
    outNv(p, 2, "merged1", "merged1")
    outNv(p, 2, "merged2", "merged2")
    outTag(p, 2, "actiontag", set = true)
  }

  test("test_patterndb_context_length (:589)") {
    val p = new Pdb(pdbMsgCountSkeleton)
    p.process(msg("prog2", "pattern13"))
    outNv(p, 1, "CONTEXT_LENGTH", "2")
    p.forgetState()
    p.process(msg("prog2", "pattern14"))
    outNv(p, 1, "CONTEXT_LENGTH", "2")
    p.forgetState()
    assertMatchesAndNv(p, "pattern15-a", "p15", "-a", program = "prog2")
    // keep state: second message reaches context length 2, action fires
    p.process(msg("prog2", "pattern15-b"))
    outNv(p, 2, "fired", "true")
  }

  test("test_rules: conflicting rules with different/same parsers (:615)") {
    val cases = Seq(
      (pdbConflictingRulesWithDifferentParsers, "pattern foobar ", "11"),
      (pdbConflictingRulesWithDifferentParsers, "pattern foobar tail", "12"),
      (pdbConflictingRulesWithDifferentParsers, "pattern foobar something else", "11"),
      (pdbConflictingRulesWithTheSameParsers, "pattern foobar ", "11"),
      (pdbConflictingRulesWithTheSameParsers, "pattern foobar tail", "12"),
      (pdbConflictingRulesWithTheSameParsers, "pattern foobar something else", "11"))
    cases.foreach { case (xml, message, expected) =>
      val p = new Pdb(xml)
      assertMatchesAndNv(p, message, ".classifier.rule_id", expected)
    }
  }

  test("test_tag_outside_of_rule_skeleton: load rejects (:678)") {
    intercept[IllegalArgumentException] {
      PdbLoader.loadString(pdbTagOutsideOfRuleSkeleton)
    }
  }

  test("test_pdb_get_filenames (:733)") {
    val base = java.nio.file.Files.createTempDirectory("graft-pdbfiles")
      .toString + "/pathutils_get_filenames"
    val dirs = Seq(base, s"$base/testdir", s"$base/testdir2")
    val files = Seq(s"$base/test.file", s"$base/test2.file",
      s"$base/testdir/test.file", s"$base/testdir2/test23.file",
      s"$base/testdir2/test22.file")
    dirs.foreach(d => new java.io.File(d).mkdirs())
    files.foreach(f => new java.io.File(f).createNewFile())
    // the C test matches '*test2*' against paths relative to the cwd;
    // here the tmp prefix contains no 'test2', so relative semantics hold
    val got = PdbLoader.sortFilenames(
      PdbLoader.pdbGetFilenames(base, recursive = true, "*test2*"))
    val expected = Seq(s"$base/test2.file",
      s"$base/testdir2/test22.file", s"$base/testdir2/test23.file")
    assert(got == expected, got.toString)
  }

  test("match_in_program: program-pattern captures land on the message (:757)") {
    val p = new Pdb(pdbTestMatchInProgram)
    val m = msg("sshd 5", "almafa")
    assert(p.process(m))
    assert(m.nv("num") == "5")
  }

  test("test_program_template (:771)") {
    val p = new Pdb(pdbTestProgramTemplate)
    p.programTemplate = Some("sshd 5")
    val m = msg("somethingelsethatdoesnotmatch", "almafa kortefa")
    assert(p.process(m))
    assert(m.nv("num") == "5")
    assert(m.nv("str") == "kortefa")
  }
}
