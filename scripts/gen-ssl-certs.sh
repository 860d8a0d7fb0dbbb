#!/usr/bin/env bash
# SSL material generator — executable twin of the reference's
# scripts/gen-ssl-certs.sh + cert.stage.sh (kafka.hpp:427-441 is the
# consuming config surface there). Same closure, re-shaped for THIS
# stack's two TLS consumers:
#
#   broker side (JKS/PKCS12 — what apache/kafka's env config takes):
#     broker.keystore.p12 / broker.truststore.p12, password $SSL_PASS
#   client side (PEM — the Kafka JAVA client names per KIP-651, the
#   exact files deploy/graft-ssl.yaml and the README recipe reference):
#     ca.pem       -> ssl.truststore.type=PEM + ssl.truststore.location
#     client.pem   -> ssl.keystore.type=PEM + ssl.keystore.location
#                     (unencrypted PKCS#8 key + signed cert, one file)
#     client.properties -> ready-made Java-client config for the broker
#                     image's console tools (the ft-ssl compose stage)
#
# Throwaway self-signed CA, SAN kafka-ssl/kafka/localhost so the same
# cert works inside the compose network and from the host. Needs only
# openssl + keytool (JDK). Idempotent: wipes and regenerates $OUT.
#
#   scripts/gen-ssl-certs.sh [outdir]   # default deploy/ssl
set -euo pipefail

cd "$(dirname "$0")/.."
OUT="${1:-deploy/ssl}"
PASS="${SSL_PASS:-graftssl}"
DAYS="${SSL_DAYS:-365}"
SAN="subjectAltName=DNS:kafka-ssl,DNS:kafka,DNS:localhost,IP:127.0.0.1"

rm -rf "$OUT"
mkdir -p "$OUT"

# 1. throwaway CA
openssl req -x509 -newkey rsa:2048 -sha256 -days "$DAYS" -nodes \
  -keyout "$OUT/ca.key" -out "$OUT/ca.pem" -subj "/CN=graft-test-ca" 2>/dev/null

issue() { # issue <name> <subject-cn> : key + CA-signed cert with SAN
  local name="$1" cn="$2"
  openssl req -newkey rsa:2048 -sha256 -nodes \
    -keyout "$OUT/$name.key" -out "$OUT/$name.csr" -subj "/CN=$cn" 2>/dev/null
  openssl x509 -req -sha256 -days "$DAYS" -in "$OUT/$name.csr" \
    -CA "$OUT/ca.pem" -CAkey "$OUT/ca.key" -CAcreateserial \
    -extfile <(printf '%s\n' "$SAN") -out "$OUT/$name.crt" 2>/dev/null
  rm -f "$OUT/$name.csr"
}

# 2. broker identity -> PKCS12 keystore + truststore (broker env config)
issue broker kafka-ssl
openssl pkcs12 -export -name broker \
  -in "$OUT/broker.crt" -inkey "$OUT/broker.key" -certfile "$OUT/ca.pem" \
  -passout "pass:$PASS" -out "$OUT/broker.keystore.p12"
keytool -importcert -noprompt -alias graft-ca -file "$OUT/ca.pem" \
  -keystore "$OUT/broker.truststore.p12" -storetype PKCS12 \
  -storepass "$PASS" >/dev/null 2>&1

# 3. client identity -> single PEM (PKCS#8 key + cert), Java PEM keystore
issue client graft-client
cat "$OUT/client.key" "$OUT/client.crt" > "$OUT/client.pem"

# 4. ready-made Java-client config (console tools / kafka-clients)
cat > "$OUT/client.properties" <<EOF
security.protocol=SSL
ssl.truststore.type=PEM
ssl.truststore.location=/etc/kafka/secrets/ca.pem
ssl.keystore.type=PEM
ssl.keystore.location=/etc/kafka/secrets/client.pem
EOF

# 5. password file for the broker image's _FILENAME-style env config
printf '%s' "$PASS" > "$OUT/pass"

# smoke: the chain verifies and the PEM pair matches
openssl verify -CAfile "$OUT/ca.pem" "$OUT/broker.crt" "$OUT/client.crt" >/dev/null
[ "$(openssl x509 -noout -modulus -in "$OUT/client.crt")" = \
  "$(openssl rsa  -noout -modulus -in "$OUT/client.key" 2>/dev/null)" ]
echo "OK: $OUT — ca.pem client.pem client.properties broker.keystore.p12 broker.truststore.p12"
