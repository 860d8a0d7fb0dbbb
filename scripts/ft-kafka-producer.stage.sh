#!/usr/bin/env bash
# FT twin of the reference's producer functional-test stage
# (reference: scripts/ft-kafka-producer.stage.sh): produce ONE 200-byte
# message with graft's kafka-client, then assert with kcat + jq that the
# wire message has a null key, a 200-byte payload, and a "ts" header —
# the exact three checks the reference stage runs.
#
# Requirements (none exist in the build sandbox — see README §"Kafka:
# what is proven without a broker"):
#   - a Kafka broker (default localhost:9092; override with BROKER=...)
#   - kcat and jq on PATH
#   - Spark's Kafka connector jars on the Spark classpath, e.g.:
#       spark-sql-kafka-0-10_2.13, kafka-clients, commons-pool2,
#       spark-token-provider-kafka-0-10_2.13
#     (drop them into /opt/spark/jars or pass via --jars)
#   - KAFKA_TOPICS_CMD: how to reach kafka-topics.sh for topic deletion
#     (default matches the reference's dockerized broker)
#
# SSL brokers (reference kafka.hpp:427-441 / scripts/gen-ssl-certs.sh):
# set BROKER_SSL to a directory with ca.pem/client.pem — the service
# YAML's `options:` block flows any kafka client property to the
# producer (generic kafka.* passthrough; Java-client ssl.truststore.*
# names, see ft-kafka-consumer.stage.sh header for the exact block);
# kcat is librdkafka-based and keeps its -X ssl.ca.location flags.
set -u

BROKER="${BROKER:-localhost:9092}"
BROKER_SSL="${BROKER_SSL:-}"
TOPIC="ft-test-producer"
KAFKA_TOPICS_CMD="${KAFKA_TOPICS_CMD:-docker exec kafka /opt/kafka/bin/kafka-topics.sh}"
TEST_STATUS=0

check() {
    local actual="${1}" expected="${2}" description="${3:-}"
    if [[ "${actual}" == "${expected}" ]]; then
        echo "Check success: ${description}"
    else
        echo "Check failed: ${description} (actual: \`${actual}\` | expected: \`${expected}\`)"
        TEST_STATUS=1
    fi
}

cd "$(dirname "$0")/.."

sbt -batch "runMain graft.tools.KafkaClient --mode produce --broker ${BROKER} --topic ${TOPIC} --count 1 --size 200"

messages=$(kcat -b "${BROKER}" -C -t "${TOPIC}" -J -c 1)

check "$(jq -r '.key' <<< "${messages}")" "null" "Key"
check "$(jq -r '.payload' <<< "${messages}" | wc -c)" 201 "Payload length"   # +1: trailing newline from jq
check "$(jq -r '.headers[0]' <<< "${messages}")" "ts" "Header key"

${KAFKA_TOPICS_CMD} --bootstrap-server "${BROKER}" --topic "${TOPIC}" --delete
echo "\`${TOPIC}\` topic has been deleted"

exit ${TEST_STATUS}
