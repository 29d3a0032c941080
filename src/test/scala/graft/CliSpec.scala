package graft

class CliSpec extends SparkTestBase {

  test("queries lists registered keys") {
    val out = Cli.run(spark, Array("queries"))
    assert(out.linesIterator.contains("q1_agg"))
    assert(out.linesIterator.size == SparkEntry.queries.size)
  }

  test("query renders a bounded table") {
    val out = Cli.run(spark, Array("query", "q5_distinct", sfDir, "3"))
    assert(out.contains("o_orderstatus"))
    assert(out.linesIterator.count(_.startsWith("|")) <= 4) // header + ≤3 rows
  }

  test("tables lists row counts") {
    val out = Cli.run(spark, Array("tables", sfDir))
    assert(out.contains("lineitem") && out.contains("6000 rows"))
  }

  test("profile renders stats") {
    val out = Cli.run(spark, Array("profile", sfDir, "orders", "o_totalprice"))
    assert(out.contains("o_totalprice") && out.contains("ndv"))
  }

  test("context commands create, switch and list persistently") {
    val base = graft.sources.Export.tempDir("graft_cli_ctx_").toString
    assert(Cli.run(spark, Array("context", base, "current")) == "default")
    assert(Cli.run(spark, Array("context", base, "create", "research"))
      .contains("research"))
    Cli.run(spark, Array("context", base, "use", "research"))
    assert(Cli.run(spark, Array("context", base, "current")) == "research")
    val listing = Cli.run(spark, Array("context", base, "list"))
    assert(listing.linesIterator.contains("* research"))
  }

  test("operations list, filter and explain") {
    val all = Cli.run(spark, Array("operations"))
    assert(all.linesIterator.exists(_.startsWith("text.langid")))
    val filtered = Cli.run(spark, Array("operations", "dedup"))
    assert(filtered.linesIterator.forall(_.startsWith("dedup.")))
    val one = Cli.run(spark, Array("operation", "mm.decode_meta"))
    assert(one.contains("id:     mm.decode_meta") && one.contains("header parse"))
    assert(one.contains("module: mm"))
  }

  test("module list and explain render the module-type catalog") {
    val listed = Cli.run(spark, Array("module", "list"))
    assert(listed.linesIterator.exists(l =>
      l.startsWith("text") && l.contains("graft.operators.TextOps")))
    assert(listed.linesIterator.exists(_.startsWith("dedup")))
    val one = Cli.run(spark, Array("module", "explain", "dedup"))
    assert(one.contains("module:       dedup"))
    assert(one.contains("implementing: graft.operators.Dedup"))
    assert(one.contains("  dedup.exact_groups") && one.contains("  dedup.line"))
    intercept[NoSuchElementException] {
      Cli.run(spark, Array("module", "explain", "no_such_module"))
    }
  }

  test("plugin list and explain render the extension-bundle catalog") {
    val listed = Cli.run(spark, Array("plugin", "list"))
    assert(listed.linesIterator.exists(l =>
      l.startsWith("graft-extensions") && l.contains("graftext.GraftExtensions")))
    val one = Cli.run(spark, Array("plugin", "explain", "graft-extensions"))
    assert(one.contains("plugin:       graft-extensions"))
    assert(one.contains("provides:     graft_dot, RewriteHofDot, GroupTopKStrategy"))
  }

  test("archive info, value info and context info render without importing") {
    import spark.implicits._
    val root = graft.sources.Export.tempDir("graft_cli_info_").toString
    val api = new GraftApi(spark, root)
    api.storeValue("v1", Seq((1L, "a"), (2L, "b")).toDF("id", "s"), Some("latest"))
    val arch = graft.sources.Export.tempDir("graft_cli_arch_").toString
    api.exportArchive(arch)
    val ai = Cli.run(spark, Array("archive", "info", arch))
    assert(ai.contains("1 values") && ai.contains("v1") && ai.contains("2 rows".trim))
    assert(ai.contains("latest -> v1"))
    val vi = Cli.run(spark, Array("value", root, "info", "latest"))
    assert(vi.contains("id:       v1") && vi.contains("rows:     2"))
    assert(vi.contains("aliases:  latest"))
    // context info goes through the active context of a base root
    val base = graft.sources.Export.tempDir("graft_cli_ctxinfo_").toString
    Cli.run(spark, Array("context", base, "create", "default"))
    val ci = Cli.run(spark, Array("context", base, "info"))
    assert(ci.contains("values:     0") && ci.contains("operations:"))
  }

  test("jobs list shows persisted records with comments") {
    import spark.implicits._
    val root = graft.sources.Export.tempDir("graft_cli_jobs_").toString
    val api = new GraftApi(spark, root)
    api.storeValue("v", Seq(1L).toDF("n"), Some("in"))
    api.registerOperation("cli_noop", df => df)
    val (j, _) = api.runJob("cli_noop", "in")
    api.setJobComment(j, "checked by hand\nsecond line ignored in listing")
    val out = Cli.run(spark, Array("jobs", root, "list"))
    assert(out.contains(j) && out.contains("cli_noop") && out.contains("# checked by hand"))
    assert(out.contains("success")) // rendered state column
    assert(!out.contains("second line"))
    assert(Cli.run(spark, Array("jobs",
      graft.sources.Export.tempDir("graft_cli_nojobs_").toString, "list")) == "no jobs recorded")
  }

  test("unknown query and bad usage fail with guidance") {
    val e1 = intercept[IllegalArgumentException] { Cli.run(spark, Array("query", "nope", sfDir)) }
    assert(e1.getMessage.contains("unknown query"))
    val e2 = intercept[IllegalArgumentException] { Cli.run(spark, Array("bogus")) }
    assert(e2.getMessage.contains("usage:"))
  }

  test("pipeline/workflow list and explain render the step structure") {
    import graft.registries.WorkflowRegistry.OpStep
    val root = graft.sources.Export.tempDir("graft_cli_wf_").toString
    val api = new GraftApi(spark, root)
    api.workflows.registerOps("curate", Seq(
      OpStep("clean", "text.clean", "docs"),
      OpStep("score", "text.quality", "clean")))
    val listing = Cli.run(spark, Array("pipeline", root, "list"))
    assert(listing.contains("curate") && listing.contains("2 steps"))
    assert(Cli.run(spark, Array("pipeline", root, "list", "cur")).contains("curate"))
    assert(Cli.run(spark, Array("pipeline", root, "list", "zz"))
      == "no pipelines registered")
    val explain = Cli.run(spark, Array("pipeline", root, "explain", "curate"))
    assert(explain.contains("op=text.clean") && explain.contains("input=clean"))
    val wl = Cli.run(spark, Array("workflow", root, "list"))
    assert(wl.contains("curate") && wl.contains("persisted"))
    val we = Cli.run(spark, Array("workflow", root, "explain", "curate"))
    assert(we.contains("workflow: curate (persisted)") && we.contains("op=text.quality"))
    // in-memory closure workflows describe as such (registry-level:
    // each Cli.run builds a fresh GraftApi, so only persisted flows
    // cross that boundary — the closure surface is the API's)
    api.workflows.register("adhoc", Seq(
      graft.plans.Pipeline.Step("only", Seq("docs"), m => m("docs"))))
    assert(!api.workflows.isPersisted("adhoc"))
    assert(api.workflows.describe("adhoc").head.op == "<closure>")
    assert(api.workflows.list.contains("adhoc"))
  }

  test("pipeline register/ops/structure/info verbs drive first-class pipeline operations") {
    import spark.implicits._
    val root = graft.sources.Export.tempDir("graft_cli_rp_").toString
    val api = new GraftApi(spark, root)
    api.storeValue("clirp",
      Seq((1L, 5L), (2L, 90L)).toDF("id", "qty"), Some("clirp_raw"))
    val spec = graft.sources.Export.tempDir("graft_cli_rp_spec_").resolve("screen.json")
    java.nio.file.Files.writeString(spec,
      """{"pipeline_name": "screen",
        | "steps": [{"name": "prof", "op": "profile.schema", "input": "t"}]}""".stripMargin)
    val reg = Cli.run(spark, Array("pipeline", root, "register", spec.toString))
    assert(reg.contains("pipeline registered: pipeline.screen"), reg)
    assert(reg.contains("inputs t") && reg.contains("output prof"))
    val ops = Cli.run(spark, Array("pipeline", root, "ops"))
    assert(ops.contains("pipeline.screen") && ops.contains("1 steps"), ops)
    assert(Cli.run(spark, Array("pipeline", root, "ops", "nomatch_zz"))
      == "no pipeline operations registered")
    val st = Cli.run(spark, Array("pipeline", root, "structure", "pipeline.screen"))
    assert(st.contains("stages: [prof]") && st.contains("op=profile.schema"), st)
    val info = Cli.run(spark, Array("pipeline", root, "info", "pipeline.screen"))
    assert(info.contains("arity: 1") && info.contains("persisted: true"), info)
    // --id override + the registered operation runs like any other
    val reg2 = Cli.run(spark,
      Array("pipeline", root, "register", spec.toString, "--id", "qc.screen"))
    assert(reg2.contains("pipeline registered: qc.screen"))
    val run = Cli.run(spark, Array("run", root, "qc.screen", "clirp_raw"))
    assert(run.contains("job:") && run.contains("col_name"), run)
  }

  test("archive register and mounts verbs attach a store; reads resolve through") {
    import spark.implicits._
    val root = graft.sources.Export.tempDir("graft_cli_mount_").toString
    val src = new GraftApi(spark,
      graft.sources.Export.tempDir("graft_cli_mount_src_").toString)
    src.storeValue("cm1", Seq((1L, "hello-mount")).toDF("id", "s"), Some("shared_corpus"))
    val arch = graft.sources.Export.tempDir("graft_cli_mount_arch_")
      .resolve("shared.kiarchive").toString
    src.exportArchive(arch)
    val reg = Cli.run(spark,
      Array("archive", "register", root, arch, "--name", "shared"))
    assert(reg.contains("archive registered: shared") && reg.contains("read-only"), reg)
    val mounts = Cli.run(spark, Array("archive", "mounts", root))
    assert(mounts.contains("shared") && mounts.contains("ro"), mounts)
    // a mounted value loads through the data verb WITHOUT an import
    val loaded = Cli.run(spark, Array("data", root, "load", "shared_corpus"))
    assert(loaded.contains("hello-mount"), loaded)
    assert(Cli.run(spark, Array("archive", "mounts",
      graft.sources.Export.tempDir("graft_cli_mount_empty_").toString))
      == "no archives registered")
  }

  test("run executes an operation on a stored value, records the job, saves") {
    import spark.implicits._
    val root = graft.sources.Export.tempDir("graft_cli_run_").toString
    val api = new GraftApi(spark, root)
    api.storeValue("docs", Seq((1L, "Hello World two")).toDF("doc_id", "text"),
      Some("raw"))
    val out = Cli.run(spark, Array("run", root, "text.token_count", "raw",
      "--save", "counted"))
    assert(out.contains("job: job-") && out.contains("n_tokens"))
    assert(out.contains("saved:") && out.contains("alias: counted"))
    // the saved alias resolves to the operation output
    val saved = new GraftApi(spark, root).getValue("counted")
    assert(saved.select("n_tokens").head().getLong(0) == 3L)
    val bad = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("run", root, "text.token_count", "raw", "--oops"))
    }
    assert(bad.getMessage.contains("--save"))
  }

  test("run --batch executes a pipeline spec file and reports its saves") {
    import spark.implicits._
    val root = graft.sources.Export.tempDir("graft_cli_batch_").toString
    val api = new GraftApi(spark, root)
    api.storeValue("docs", Seq((1L, "Hello World two"), (2L, "one")).toDF(
      "doc_id", "text"), Some("raw"))
    val spec = graft.sources.Export.tempDir("graft_cli_batchspec_")
      .resolve("nightly.json")
    java.nio.file.Files.write(spec,
      """{"steps": [{"name": "counts", "op": "text.token_count", "input": "d"}],
        | "inputs": {"d": "raw"}, "save": {"counts": "tokens"}}""".stripMargin
        .getBytes("UTF-8"))
    val out = Cli.run(spark, Array("run", root, "--batch", spec.toString))
    assert(out.contains("batch run: batch-nightly-"), out)
    assert(out.contains("counts") && out.contains("alias 'tokens'"), out)
    assert(api.getValue("tokens").count() == 2L)
  }

  test("data list and type list catalog stored values and data types") {
    import spark.implicits._
    val root = graft.sources.Export.tempDir("graft_cli_data_").toString
    val api = new GraftApi(spark, root)
    api.storeValue("events_clean", Seq(1L, 2L, 3L).toDF("n"), Some("latest"))
    api.storeValue("docs_raw", Seq("a").toDF("t"))
    val out = Cli.run(spark, Array("data", root, "list"))
    assert(out.contains("events_clean") && out.contains("3 rows"))
    assert(out.contains("aliases: latest") && out.contains("docs_raw"))
    val filtered = Cli.run(spark, Array("data", root, "list", "docs*"))
    assert(filtered.contains("docs_raw") && !filtered.contains("events_clean"))
    assert(Cli.run(spark, Array("data",
      graft.sources.Export.tempDir("graft_cli_nodata_").toString, "list"))
      == "no values stored")
    val types = Cli.run(spark, Array("type", "list"))
    assert(types.contains("integer") && types.contains("BIGINT"))
    assert(types.contains("table") || types.contains("string"))
  }

  test("data load/explain/filter verbs round-trip a stored value") {
    import spark.implicits._
    val root = graft.sources.Export.tempDir("graft_cli_dload_").toString
    val api = new GraftApi(spark, root)
    api.storeValue("docs", Seq((1L, "Hello World two")).toDF("doc_id", "text"),
      Some("raw"))
    val loaded = Cli.run(spark, Array("data", root, "load", "raw", "5"))
    assert(loaded.contains("doc_id") && loaded.contains("Hello World two"))
    val explained = Cli.run(spark, Array("data", root, "explain", "docs"))
    assert(explained.contains("id:       docs")
      && explained.contains("aliases:  raw"))
    val filtered = Cli.run(spark,
      Array("data", root, "filter", "raw", "text.token_count", "--save", "tc"))
    assert(filtered.contains("job: job-") && filtered.contains("n_tokens"))
    assert(new GraftApi(spark, root).getValue("tc")
      .select("n_tokens").head().getLong(0) == 3L)
  }

  test("data import/export verbs dispatch formats over the store") {
    import spark.implicits._
    val root = graft.sources.Export.tempDir("graft_cli_dio_").toString
    val tmp = graft.sources.Export.tempDir("graft_cli_dio_files_").toString
    Seq((1L, "x"), (2L, "y")).toDF("k", "v")
      .write.mode("overwrite").option("header", "true").csv(s"$tmp/in_csv")
    val imp = Cli.run(spark,
      Array("data", root, "import", "pairs", "csv", s"$tmp/in_csv"))
    assert(imp.contains("imported: pairs") && imp.contains("2 rows"))
    val exp = Cli.run(spark,
      Array("data", root, "export", "pairs", "json", s"$tmp/out_json"))
    assert(exp.contains("exported: pairs"))
    assert(spark.read.json(s"$tmp/out_json").count() == 2)
  }

  test("archive export/import verbs move values across context roots") {
    import spark.implicits._
    val src = graft.sources.Export.tempDir("graft_cli_arc_src_").toString
    val dst = graft.sources.Export.tempDir("graft_cli_arc_dst_").toString
    val arc = graft.sources.Export.tempDir("graft_cli_arc_dir_").toString + "/a1"
    val api = new GraftApi(spark, src)
    api.storeValue("t1", Seq(1L, 2L).toDF("n"), Some("nums"))
    api.storeValue("t2", Seq("z").toDF("s"))
    val out = Cli.run(spark, Array("archive", "export", src, arc))
    assert(out.contains("exported archive") && out.contains("2 values")
      && out.contains("t1") && out.contains("t2"))
    val in = Cli.run(spark, Array("archive", "import", dst, arc))
    assert(in.contains("imported archive: 2 values"))
    val moved = new GraftApi(spark, dst)
    assert(moved.getValue("nums").count() == 2)
    assert(moved.getValue("t2").columns.sameElements(Array("s")))
  }

  test("archive copy and archive meta verbs: skip-existing copy, manifest metadata") {
    import spark.implicits._
    val src = graft.sources.Export.tempDir("graft_cli_cp_src_").toString
    val dir = graft.sources.Export.tempDir("graft_cli_cp_dir_").toString
    val api = new GraftApi(spark, src)
    api.storeValue("v1", Seq(1L, 2L).toDF("n"), Some("nums"))
    Cli.run(spark, Array("archive", "export", src, s"$dir/a"))
    assert(Cli.run(spark, Array("archive", "meta", s"$dir/a", "title", "probe set"))
      .contains("title=probe set"))
    val cp = Cli.run(spark, Array("archive", "copy", s"$dir/a", s"$dir/b"))
    assert(cp.contains("copied 1 values") && cp.contains("v1"))
    // re-copy: everything already present
    assert(Cli.run(spark, Array("archive", "copy", s"$dir/a", s"$dir/b"))
      .contains("nothing to copy"))
    val info = Cli.run(spark, Array("archive", "info", s"$dir/b"))
    assert(info.contains("archive metadata:") && info.contains("title=probe set"))
  }

  test("workflow alias verb and info-bearing list/explain") {
    import spark.implicits._
    val root = graft.sources.Export.tempDir("graft_cli_wfa_").toString
    val api = new GraftApi(spark, root)
    api.storeValue("d", Seq((1L, 99L)).toDF("id", "qty"), Some("cli_wfa_raw"))
    graft.plans.OpRegistry.register("cli_wfa_id", df => df)
    val wf = api.createWorkflow("nightly")
    wf.addStep("s1", "cli_wfa_id", "in")
    wf.setInput("in", "cli_wfa_raw")
    wf.snapshot(save = true)
    wf.save()
    assert(Cli.run(spark, Array("workflow", root, "alias", "prod", "nightly"))
      .contains("prod -> nightly"))
    val ls = Cli.run(spark, Array("workflow", root, "list"))
    assert(ls.contains("nightly") && ls.contains("aka prod")
      && ls.contains("1 snapshot(s)"))
    val ex = Cli.run(spark, Array("workflow", root, "explain", "prod"))
    assert(ex.contains("workflow: nightly") && ex.contains("aliases: prod")
      && ex.contains("inputs: in") && ex.contains("snapshots: 1"))
  }

  test("run --manifest instantiates a configured module and renders the job") {
    import spark.implicits._
    val root = graft.sources.Export.tempDir("graft_cli_mf_").toString
    val api = new GraftApi(spark, root)
    api.storeValue("m", Seq((1L, 10L), (2L, 90L)).toDF("id", "qty"), Some("cli_mf_raw"))
    val out = Cli.run(spark, Array("run", root, "--manifest", "table.filter",
      "cli_mf_raw", "where=qty > 50"))
    assert(out.contains("manifest table.filter"), out)
    assert(out.linesIterator.count(_.startsWith("|")) == 2) // header + 1 row
    // the manifest config was recorded as job metadata
    assert(api.findMetadataItems("manifest")
      .exists(_.value == "table.filter{where=qty > 50}"))
  }

  test("info config print reports the effective engine configuration") {
    val out = Cli.run(spark, Array("info", "config", "print"))
    assert(out.contains("spark:   " + org.apache.spark.SPARK_VERSION))
    assert(out.contains("spark.sql.session.timeZone") && out.contains("UTC"))
    assert(out.contains("spark.sql.shuffle.partitions"))
  }

  test("render list-renderers catalogs targets; render item dispatches each") {
    val cat = Cli.run(spark, Array("render", "list-renderers"))
    assert(cat.contains("string") && cat.contains("markdown") && cat.contains("html"))
    assert(cat.contains("template"))
    val md = Cli.run(spark, Array("render", "item", "markdown", "q1_agg", sfDir, "3"))
    assert(md.startsWith("| ") && md.contains("| --- |"))
    val html = Cli.run(spark, Array("render", "item", "html", "q1_agg", sfDir, "3"))
    assert(html.startsWith("<table>") && html.endsWith("</table>"))
    val e = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("render", "item", "pdf", "q1_agg", sfDir))
    }
    assert(e.getMessage.contains("unknown renderer"))
    // the catalog lists registered value->value renderers, and `render
    // item` falls through to them for non-string targets (r12 seam)
    assert(cat.contains("value:table->schema"))
    val sch = Cli.run(spark, Array("render", "item", "schema", "q1_agg", sfDir))
    assert(sch.contains("col_name") && sch.contains("l_returnflag"))
    graft.operators.Render.ValueRenderOps.register("table", "cli_rows",
      df => df.agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_rows")))
    val rc = Cli.run(spark, Array("render", "item", "cli_rows", "q5_distinct", sfDir))
    assert(rc.contains("n_rows"))
  }

  test("render pipeline: markdown, mermaid, html and script targets over a registered workflow") {
    import graft.registries.WorkflowRegistry.OpStep
    val root = graft.sources.Export.tempDir("graft_cli_rp_").toString
    val api = new GraftApi(spark, root)
    api.workflows.registerOps("demo", Seq(
      OpStep("clean", "text.clean", "docs"),
      OpStep("score", "text.quality", "clean"),
      OpStep("stats", "text.stats", "clean")))
    val cat = Cli.run(spark, Array("render", "list-renderers"))
    assert(cat.contains("pipeline:mermaid") && cat.contains("pipeline:script"))
    // canonical target-first order, aligned with `render item <target> ...`
    val md = Cli.run(spark, Array("render", "pipeline", "markdown", root, "demo"))
    assert(md.startsWith("# pipeline: demo"))
    assert(md.contains("- docs")) // the unbound pipeline input
    assert(md.contains("| clean | text.clean | docs |"))
    assert(md.contains("- score") && md.contains("- stats")) // both leaves
    val mm = Cli.run(spark, Array("render", "pipeline", "mermaid", root, "demo"))
    assert(mm.contains("graph TD"))
    assert(mm.contains("""i0(["docs"])""")) // input node
    assert(mm.contains("i0 --> s0") && mm.contains("s0 --> s1") && mm.contains("s0 --> s2"))
    val html = Cli.run(spark, Array("render", "pipeline", "html", root, "demo"))
    assert(html.contains("<h1>pipeline: demo</h1>"))
    assert(html.contains("<td>text.quality</td>"))
    val sc = Cli.run(spark, Array("render", "pipeline", "script", root, "demo"))
    assert(sc.contains("""val clean = OpRegistry.get("text.clean")(docs)"""))
    assert(sc.contains("bind pipeline input 'docs'")) // unbound-input placeholder
    // the pre-r10 target-last order is still accepted
    assert(Cli.run(spark, Array("render", "pipeline", root, "demo", "markdown")) == md)
    val e = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("render", "pipeline", root, "demo", "png"))
    }
    assert(e.getMessage.contains("renderer target"))
  }

  test("render pipeline: a root directory literally named like a target parses as target-last") {
    import graft.registries.WorkflowRegistry.OpStep
    // a RELATIVE root named 'markdown' (a real directory) used in the
    // legacy target-last order must not be mis-parsed as target-first —
    // that would silently swap root and pipeline name
    val rel = java.nio.file.Paths.get("markdown")
    val created = !java.nio.file.Files.exists(rel)
    if (created) java.nio.file.Files.createDirectories(rel)
    try {
      val api = new GraftApi(spark, "markdown")
      api.workflows.registerOps("amb", Seq(OpStep("clean", "text.clean", "docs")))
      val mm = Cli.run(spark, Array("render", "pipeline", "markdown", "amb", "mermaid"))
      assert(mm.contains("graph TD")) // rendered as mermaid, root=markdown
      // target-first still wins when the first arg is NOT a directory of
      // a legacy invocation (third arg not a target)
      val md = Cli.run(spark, Array("render", "pipeline", "markdown", "markdown", "amb"))
      assert(md.startsWith("# pipeline: amb"))
    } finally {
      if (created) {
        java.nio.file.Files.walk(rel).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  test("render api kiara_api emits the marker-injected Scala facade stub") {
    val cat = Cli.run(spark, Array("render", "list-renderers"))
    assert(cat.contains("api:kiara_api"))
    val src = Cli.run(spark, Array("render", "api", "kiara_api"))
    // template shell survives verbatim around the generated block
    assert(src.startsWith("// GraftApiFacade — GENERATED"))
    assert(src.contains("final class GraftApiFacade(spark: SparkSession, root: String)"))
    assert(src.contains(graft.operators.Render.BeginEndpointsMarker))
    assert(src.contains(graft.operators.Render.EndEndpointsMarker))
    // one delegating def per endpoint, Scala-bracket generics, argN names
    val eps = GraftApi.endpoints
    assert(eps.size >= 50)
    eps.foreach(e => assert(src.contains(s"def ${e.name}"), s"missing def ${e.name}"))
    assert(src.contains("api.runJob(arg0, arg1)") ||
      src.contains("api.runJob(arg0, arg1, arg2)"))
    assert(!src.contains("<")) // generics converted to []
    // zero-arg endpoints render as parameterless defs
    assert("def \\w+: ".r.findFirstIn(src).isDefined)
    // a caller template: ONLY the marker block is regenerated
    val dir = graft.sources.Export.tempDir("graft_api_tpl_")
    val tplPath = dir.resolve("Facade.scala")
    java.nio.file.Files.write(tplPath,
      ("// custom shell\nclass MyFacade {\n  private val api = ???\n" +
        "  // BEGIN AUTO-GENERATED-ENDPOINTS\n  // stale\n" +
        "  // END AUTO-GENERATED-ENDPOINTS\n}\n").getBytes("UTF-8"))
    val custom = Cli.run(spark,
      Array("render", "api", "kiara_api", tplPath.toString))
    assert(custom.startsWith("// custom shell"))
    assert(custom.contains("class MyFacade"))
    assert(!custom.contains("// stale")) // replaced, not appended
    assert(custom.contains("def runJob"))
    // a template without markers is refused with guidance
    val bad = dir.resolve("bad.scala")
    java.nio.file.Files.write(bad, "class X {}\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("render", "api", "kiara_api", bad.toString))
    }
    assert(e.getMessage.contains("marker"))
  }

  test("--service proxy forwards CLI verbs through a live TCP daemon") {
    // kiara zmq/client.py:32 request_cli: the CLI rides a running
    // service's warm session instead of paying a SparkSession cold start
    val infoFile = graft.sources.Export.tempDir("graft_cli_proxy_").toString + "/svc.json"
    @volatile var port = 0
    val latch = new java.util.concurrent.CountDownLatch(1)
    val server = new Thread(() =>
      Serve.serveTcp(spark, 0, Some(infoFile), p => { port = p; latch.countDown() }))
    server.setDaemon(true)
    server.start()
    assert(latch.await(30, java.util.concurrent.TimeUnit.SECONDS))
    try {
      // a query and a tables listing round-trip through the daemon
      val q = Cli.proxy(infoFile, Seq("query", "q5_distinct", sfDir, "3"))
      assert(q.contains("|")) // pretty-printed table came back
      val tables = Cli.proxy(infoFile, Seq("tables", sfDir))
      assert(tables.contains("lineitem") && tables.contains("rows"))
      val keys = Cli.proxy(infoFile, Seq("queries"))
      assert(keys.linesIterator.contains("q1_agg"))
      // service-side failures surface as local exceptions, not silence
      val e = intercept[IllegalStateException] {
        Cli.proxy(infoFile, Seq("query", "no_such_query", sfDir))
      }
      assert(e.getMessage.contains("unknown query"))
    } finally {
      Serve.request("127.0.0.1", port, """{"endpoint":"shutdown"}""")
      server.join(30000)
    }
    assert(!server.isAlive)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(infoFile)))
  }

  test("render api: the endpoint catalog renders to markdown and html") {
    val cat = Cli.run(spark, Array("render", "list-renderers"))
    assert(cat.contains("api:markdown") && cat.contains("api:html"))
    val md = Cli.run(spark, Array("render", "api", "markdown"))
    assert(md.startsWith("# graft API endpoints"))
    // >= 50 endpoints, each with name | signature | doc columns
    val rows = md.linesIterator.count(_.startsWith("| "))
    assert(rows - 2 >= 50, s"expected >= 50 endpoint rows, got ${rows - 2}")
    assert(md.contains("| runJob |") && md.contains("record the job"))
    assert(md.contains("| storeValue |") && md.contains("`storeValue("))
    val html = Cli.run(spark, Array("render", "api", "html"))
    assert(html.startsWith("<html><body><h1>graft API endpoints"))
    assert(html.split("<tr>", -1).length - 2 >= 50) // header row + endpoint rows
    assert(html.contains("<td>exportArchive</td>"))
    assert(!html.contains("$")) // no mangled synthetic members leak through
    val e = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("render", "api", "png"))
    }
    assert(e.getMessage.contains("api") && e.getMessage.contains("markdown"))
  }

  test("render pipeline handles a workflow containing mock steps") {
    import graft.registries.WorkflowRegistry.OpStep
    graft.plans.Mock.register(spark, "mock.seed",
      Seq("doc_id" -> "integer", "text" -> "string"), Seq(Seq("1", "x")))
    val root = graft.sources.Export.tempDir("graft_cli_mock_").toString
    val api = new GraftApi(spark, root)
    api.workflows.registerOps("proto", Seq(
      OpStep("seed", "mock.seed", "nothing"),
      OpStep("clean", "text.clean", "seed"),
      OpStep("count", "text.token_count", "clean")))
    val md = Cli.run(spark, Array("render", "pipeline", "markdown", root, "proto"))
    assert(md.contains("| seed | mock.seed | nothing |"))
    val sc = Cli.run(spark, Array("render", "pipeline", "script", root, "proto"))
    assert(sc.contains("""OpRegistry.get("mock.seed")"""))
    // the mock op resolves and runs from the generated-script's registry path
    assert(graft.plans.OpRegistry.get("mock.seed")(spark.emptyDataFrame).count() == 1)
  }

  test("render pipeline script refuses colliding mangled identifiers; mermaid checks cycles") {
    import graft.registries.WorkflowRegistry.OpStep
    val root = graft.sources.Export.tempDir("graft_cli_collide_").toString
    val api = new GraftApi(spark, root)
    // 'a-b' and 'a.b' both mangle to Scala identifier a_b
    api.workflows.registerOps("collide", Seq(
      OpStep("a-b", "text.clean", "docs"),
      OpStep("a.b", "text.stats", "a-b")))
    val e = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("render", "pipeline", "script", root, "collide"))
    }
    assert(e.getMessage.contains("a-b") && e.getMessage.contains("a.b")
      && e.getMessage.contains("a_b"))
    // the other targets render the same pipeline fine (names are legal there)
    assert(Cli.run(spark, Array("render", "pipeline", "markdown", root, "collide"))
      .contains("| a-b | text.clean | docs |"))
    // a cyclic pipeline fails loudly on EVERY target incl. mermaid
    api.workflows.registerOps("loopy", Seq(
      OpStep("x", "text.clean", "y"),
      OpStep("y", "text.stats", "x")))
    val ec = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("render", "pipeline", "mermaid", root, "loopy"))
    }
    assert(ec.getMessage.contains("cannot progress"))
  }

  test("render archive html and render job script mirror kiara's archive/job renderers") {
    import spark.implicits._
    val root = graft.sources.Export.tempDir("graft_cli_rarch_").toString
    val api = new GraftApi(spark, root)
    graft.plans.Builtins.ensureRegistered()
    api.storeValue("corpus", Seq((1L, "<tag>"), (2L, "b")).toDF("id", "s"), Some("cv"))
    val (jobId, _) = api.runJob("profile.schema", "corpus")
    val arch = graft.sources.Export.tempDir("graft_cli_rarch_out_").toString + "/a1"
    api.exportArchive(arch)
    val html = Cli.run(spark, Array("render", "archive", "html", arch))
    assert(html.startsWith("<html>") && html.contains("<h1>archive"))
    assert(html.contains("<td>corpus</td>") && html.contains("<td>2</td>")) // rows from footers
    assert(html.contains("<td>cv</td>")) // alias table rendered
    // target-last order accepted here too
    assert(Cli.run(spark, Array("render", "archive", arch, "html")) == html)
    val sc = Cli.run(spark, Array("render", "job", "script", root, jobId))
    assert(sc.contains(s"graft job '$jobId'"))
    assert(sc.contains("""OpRegistry.get("profile.schema")(corpus)"""))
    assert(sc.contains("bind pipeline input 'corpus'"))
    val e = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("render", "archive", "pdf", arch))
    }
    assert(e.getMessage.contains("unknown target"))
  }

  test("render item --template renders rows through a user template") {
    val out = Cli.run(spark, Array("render", "item", "template", "q1_agg", sfDir,
      "--template", "flag {{l_returnflag}}: qty={{sum_qty}}", "2"))
    val lines = out.split("\n")
    assert(lines.length == 2)
    assert(lines.forall(l => l.startsWith("flag ") && l.contains(": qty=")))
    assert(!out.contains("{{")) // every placeholder substituted
    // a template naming a nonexistent column is a usage error
    val e = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("render", "item", "template", "q1_agg", sfDir,
        "--template", "{{no_such_col}}", "2"))
    }
    assert(e.getMessage.contains("unknown column"))
    // the template target without --template is a usage error
    val e2 = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("render", "item", "template", "q1_agg", sfDir, "2"))
    }
    assert(e2.getMessage.contains("needs a template"))
  }

  test("metadata verbs attach, list, find and explain items; jobs explain shows env") {
    val root = graft.sources.Export.tempDir("graft_cli_meta_").toString
    val api = new GraftApi(spark, root)
    import spark.implicits._
    api.storeValue("docs", Seq((1L, "x")).toDF("id", "s"), Some("corpus"))
    val added = Cli.run(spark,
      Array("metadata", root, "add", "corpus", "licence", "CC-BY-4.0"))
    assert(added.contains("licence") && added.contains("item hash"))
    val hash = added.split("item hash ").last.trim
    assert(Cli.run(spark, Array("metadata", root, "list")).contains("CC-BY-4.0"))
    assert(Cli.run(spark, Array("metadata", root, "find", "lic*"))
      .contains("licence"))
    val explained = Cli.run(spark, Array("metadata", root, "explain", hash))
    assert(explained.contains("key:   licence") && explained.contains("value: CC-BY-4.0"))
    assert(Cli.run(spark, Array("value", root, "info", "docs"))
      .contains("metadata: licence=CC-BY-4.0"))
    // jobs explain renders the record plus the recorded environment
    api.registerOperation("cli_env_id", df => df)
    val (jobId, _) = api.runJob("cli_env_id", "corpus")
    val job = Cli.run(spark, Array("jobs", root, "explain", jobId))
    assert(job.contains(s"job:       $jobId"))
    assert(job.contains("environment: ") && job.contains("spark.version"))
  }
}
