package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

import graft.runtime.YamlLite

/** The helm chart twin (deploy/helm/graft ↔ the reference's
  * helm/dsp-svc, deployment walkthrough doc/test.adoc:69-87): templates
  * use ONLY scalar `{{ .Values.* }}` / `{{ .Chart.* }}` substitutions, a
  * strict subset of Go template syntax that real `helm template`
  * evaluates identically — so this spec can render the chart with a
  * 20-line substituter (no helm binary in this sandbox) and assert the
  * output is EXACTLY the hand-maintained deploy/k8s-service.yaml. The
  * chart and the raw manifest can therefore never drift apart.
  */
class HelmChartSpec extends AnyFunSuite {

  private val chartDir = "deploy/helm/graft"

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  /** Named templates from `templates/_helpers.tpl`: `{{- define "x" -}}
    * body {{- end }}` blocks, bodies trimmed (the `-` markers strip the
    * surrounding whitespace in real helm the same way).
    */
  private lazy val helpers: Map[String, String] = {
    val src = read(s"$chartDir/templates/_helpers.tpl")
    raw"""(?s)\{\{-?\s*define "([^"]+)"\s*-?\}\}(.*?)\{\{-?\s*end\s*-?\}\}""".r
      .findAllMatchIn(src)
      .map(m => m.group(1) -> m.group(2).trim)
      .toMap
  }

  /** helm-template subset renderer: `{{ .Values.a.b }}` from values.yaml,
    * `{{ .Chart.X }}` from Chart.yaml (capitalized built-ins only, as
    * real helm), `{{ include "x" . }}` from [[helpers]] (recursive,
    * bounded). Unknown constructs are a test failure — the chart must
    * stay inside the subset or switch to real helm in CI.
    */
  private def render(template: String, values: YamlLite.Node, chart: YamlLite.Node): String = {
    // include expansion first (helper bodies may reference .Values or
    // other helpers; depth-bounded so a define cycle fails loudly)
    val includeExpr = raw"""\{\{-?\s*include "([^"]+)" \.\s*-?\}\}""".r
    var expanded = template
    var depth = 0
    while (includeExpr.findFirstIn(expanded).isDefined && depth < 10) {
      expanded = includeExpr.replaceAllIn(
        expanded,
        m =>
          helpers.get(m.group(1)) match {
            case Some(body) => java.util.regex.Matcher.quoteReplacement(body)
            case None => fail(s"""include "${m.group(1)}" has no define in _helpers.tpl""")
          }
      )
      depth += 1
    }
    assert(
      includeExpr.findFirstIn(expanded).isEmpty,
      "include expansion did not converge in 10 rounds — define cycle?"
    )
    renderScalars(expanded, values, chart)
  }

  private def renderScalars(template: String, values: YamlLite.Node, chart: YamlLite.Node): String = {
    // {{ if .Values.flag }} body {{ end }} — non-nested boolean gates, the
    // one extra construct the r14 parity templates (hpa, serviceaccount)
    // need; real helm evaluates the same way for boolean scalars
    val ifExpr = raw"(?s)\{\{\s*if \.Values\.([A-Za-z0-9_.]+)\s*\}\}\n?(.*?)\{\{\s*end\s*\}\}\n?".r
    val gated = ifExpr.replaceAllIn(
      template,
      m =>
        if (values.get(m.group(1)).exists(_.str == "true"))
          java.util.regex.Matcher.quoteReplacement(m.group(2))
        else ""
    )
    val expr = raw"\{\{\s*\.(Values|Chart)\.([A-Za-z0-9_.]+)\s*\}\}".r
    val out = expr.replaceAllIn(
      gated,
      m => {
        val root = if (m.group(1) == "Values") values else chart
        // real Helm 3 exposes Chart metadata CAPITALIZED (.Chart.Name,
        // .Chart.Version, .Chart.AppVersion) and FAILS rendering on a
        // lowercase field — reject it here too, so this renderer can
        // never mask drift real helm aborts on (the r14 .Chart.name bug
        // shipped precisely because the renderer resolved lowercase keys
        // straight from Chart.yaml)
        val key =
          if (m.group(1) == "Chart") {
            val f = m.group(2)
            if (!f.head.isUpper)
              fail(s".Chart.$f is not a valid Helm built-in (Chart fields are capitalized: .Chart.${f.head.toUpper}${f.tail})")
            f.head.toLower.toString + f.tail // .Chart.Name -> Chart.yaml's name:
          } else m.group(2)
        root.get(key) match {
          case Some(n) => java.util.regex.Matcher.quoteReplacement(n.str)
          case None => fail(s"template references missing value .${m.group(1)}.${m.group(2)}")
        }
      }
    )
    assert(!out.contains("{{"), s"unrendered construct left in template:\n$out")
    out
  }

  /** Comment/blank normalization so template-side scaladoc-style headers
    * and hand-side margin comments don't participate in the identity.
    */
  private def normalize(doc: String): Seq[String] =
    doc.linesIterator
      .map(_.replaceAll("\\s+#.*$", "").replaceAll("\\s+$", ""))
      .filterNot(l => l.trim.isEmpty || l.trim.startsWith("#"))
      .toSeq

  test("chart renders IDENTICALLY to the hand-maintained k8s-service.yaml") {
    val values = YamlLite.parse(read(s"$chartDir/values.yaml"))
    val chart = YamlLite.parse(read(s"$chartDir/Chart.yaml"))
    val hand = read("deploy/k8s-service.yaml").split("(?m)^---$")
    val templates = Seq(
      "templates/configmap.yaml",
      "templates/deployment.yaml",
      "templates/service.yaml",
      "templates/service-metrics.yaml",
      "templates/serviceaccount.yaml"
    )
    assert(hand.length == templates.length, "doc count drifted between chart and manifest")
    templates.zip(hand).foreach { case (t, handDoc) =>
      val rendered = normalize(render(read(s"$chartDir/$t"), values, chart))
      val expected = normalize(handDoc)
      assert(
        rendered == expected,
        s"$t diverged from k8s-service.yaml:\n" +
          rendered.zipAll(expected, "<missing>", "<missing>")
            .filter { case (a, b) => a != b }
            .take(5)
            .map { case (a, b) => s"  chart: $a\n  hand : $b" }
            .mkString("\n")
      )
    }
  }

  test("values.yaml knobs mirror the reference chart's surface") {
    val values = YamlLite.parse(read(s"$chartDir/values.yaml"))
    // the knobs shared with helm/dsp-svc/values.yaml keep its defaults
    assert(values("replicaCount").int == 1)
    assert(values("image.pullPolicy").str == "Never")
    assert(values("service.type").str == "LoadBalancer")
    assert(values("service.port").int == 7200)
    assert(values("metrics.port").int == 9555)
    assert(values("serviceAccount.create").str == "true")
    assert(values("serviceAccount.automount").str == "true")
    assert(values("autoscaling.enabled").str == "false") // reference default
    assert(values("autoscaling.minReplicas").int == 1)
    val chart = YamlLite.parse(read(s"$chartDir/Chart.yaml"))
    assert(chart("apiVersion").str == "v2" && chart("type").str == "application")
  }

  test("hpa.yaml: empty at the reference default, a full HPA when autoscaling.enabled") {
    val values = YamlLite.parse(read(s"$chartDir/values.yaml"))
    val chart = YamlLite.parse(read(s"$chartDir/Chart.yaml"))
    // default (enabled: false): the gate removes the whole manifest
    val off = normalize(render(read(s"$chartDir/templates/hpa.yaml"), values, chart))
    assert(off.isEmpty, s"disabled autoscaling must render no HPA, got:\n${off.mkString("\n")}")
    // enabled: the scalars land where the reference's hpa.yaml puts them
    val enabled = YamlLite.parse(
      read(s"$chartDir/values.yaml").replace("enabled: false", "enabled: true"))
    val on = normalize(render(read(s"$chartDir/templates/hpa.yaml"), enabled, chart))
    assert(on.contains("kind: HorizontalPodAutoscaler"))
    assert(on.contains("  minReplicas: 1"))
    assert(on.contains("  maxReplicas: 4"))
    assert(on.contains("          averageUtilization: 80"))
    assert(on.exists(_.contains("name: graft-svc")), "HPA must target the Deployment")
  }

  test("_helpers.tpl: one values-driven rename reaches every template (no fan-out edits)") {
    val chart = YamlLite.parse(read(s"$chartDir/Chart.yaml"))
    val renamed = YamlLite.parse(
      read(s"$chartDir/values.yaml")
        .replace("nameOverride: graft-svc", "nameOverride: acme-svc")
        .replace("serviceName: graft-metrics", "serviceName: acme-metrics")
        .replace("enabled: false", "enabled: true") // render the HPA too
    )
    def r(t: String) = render(read(s"$chartDir/templates/$t"), renamed, chart)
    val dep = r("deployment.yaml")
    assert(dep.contains("name: acme-svc") && dep.contains("labels: {app: acme-svc}") &&
      dep.contains("matchLabels: {app: acme-svc}"), "deployment identity did not follow the rename")
    val svc = r("service.yaml")
    assert(svc.contains("name: acme-svc") && svc.contains("selector: {app: acme-svc}"))
    val met = r("service-metrics.yaml")
    assert(met.contains("selector: {app: acme-svc}"))
    // the metrics Service's NAME renames too (two releases in one
    // namespace must not fight over a hardcoded 'graft-metrics')
    assert(met.contains("name: acme-metrics"), "metrics Service kept the old name")
    assert(r("tests/test-connection.yaml").contains("http://acme-metrics:"))
    assert(r("hpa.yaml").contains("    name: acme-svc"), "HPA must retarget the renamed Deployment")
    assert(r("serviceaccount.yaml").contains("labels: {app: acme-svc}"))
    assert(r("tests/test-connection.yaml").contains("name: acme-svc-test-connection"))
    assert(r("NOTES.txt").contains("kubectl get svc acme-svc -w"))
    // nothing keeps the old app identity anywhere
    Seq("deployment.yaml", "service.yaml", "service-metrics.yaml", "hpa.yaml",
      "serviceaccount.yaml", "tests/test-connection.yaml").foreach { t =>
      assert(!r(t).contains("app: graft-svc"), s"$t kept the old identity after the rename")
    }
  }

  test("test-connection hook and NOTES render inside the scalar subset") {
    val values = YamlLite.parse(read(s"$chartDir/values.yaml"))
    val chart = YamlLite.parse(read(s"$chartDir/Chart.yaml"))
    val hook = render(read(s"$chartDir/templates/tests/test-connection.yaml"), values, chart)
    assert(hook.contains("\"helm.sh/hook\": test"))
    assert(hook.contains("nc -z -w 5 graft-svc 7200"), "probe must hit the ingress port")
    assert(hook.contains("graft-metrics:9555"), "probe must hit the metrics service")
    val notes = render(read(s"$chartDir/templates/NOTES.txt"), values, chart)
    assert(notes.contains("graft-svc deployed."))
    assert(notes.contains("nc $SERVICE_IP 7200"))
    assert(notes.contains("helm test graft"))
  }
}
