# Named-template helper layer (the reference chart derives its labels/
# names via _helpers.tpl the same way): the app identity is defined ONCE
# here, driven by .Values.nameOverride, so a values-driven rename never
# fans out over the templates. Bodies stay inside the chart's scalar
# subset (flow-style maps, no sprig pipelines) so the HelmChartSpec
# renderer and real `helm template` agree line-for-line.
{{- define "graft.name" -}}
{{ .Values.nameOverride }}
{{- end }}

{{- define "graft.labels" -}}
{app: {{ include "graft.name" . }}}
{{- end }}

{{- define "graft.selectorLabels" -}}
{app: {{ include "graft.name" . }}}
{{- end }}

{{- define "graft.metricsName" -}}
{{ .Values.metrics.serviceName }}
{{- end }}
