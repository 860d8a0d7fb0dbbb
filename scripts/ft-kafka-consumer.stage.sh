#!/usr/bin/env bash
# FT twin of the reference's consumer functional-test stage
# (reference: scripts/ft-kafka-consumer.stage.sh): produce two keyed
# messages with kcat onto a 5-partition topic, consume them with graft's
# kafka-client, and assert the two "Message consumed: key=... value=..."
# lines the reference stage greps from its consumer log. graft's consume
# is a batch read (Spark kafka source, startingOffsets=earliest), so the
# produce happens first and no SIGINT choreography is needed; the
# observable checks are identical.
#
# Requirements: a Kafka broker, kcat, Spark Kafka connector jars — see
# ft-kafka-producer.stage.sh and README §"Kafka: what is proven without
# a broker".
#
# SSL brokers (reference kafka.hpp:427-441 / scripts/gen-ssl-certs.sh):
# set BROKER_SSL to a directory holding ca.pem/client.pem and the service
# YAML gains an `options:` block (generic kafka.* passthrough,
# GraftService.parseConfig → StreamRuntime.kafkaClientOptions). The
# client behind Spark's connector is the Apache KAFKA JAVA client, so the
# property names are its ssl.truststore.*/ssl.keystore.* family (PEM
# support per KIP-651) — librdkafka's ssl.ca.location names, which the
# reference uses, are unknown configs the Java client would ignore:
#   options:
#     security.protocol: SSL
#     ssl.truststore.type:     PEM
#     ssl.truststore.location: ${BROKER_SSL}/ca.pem
#     ssl.keystore.type:       PEM            # only for mTLS client auth
#     ssl.keystore.location:   ${BROKER_SSL}/client.pem   # key + cert chain
# kcat is librdkafka-based and keeps -X ssl.ca.location=... flags.
set -u

BROKER="${BROKER:-localhost:9092}"
BROKER_SSL="${BROKER_SSL:-}"
TOPIC="ft-test-consumer"
KAFKA_TOPICS_CMD="${KAFKA_TOPICS_CMD:-docker exec kafka /opt/kafka/bin/kafka-topics.sh}"
LOG_CLIENT="${LOG_CLIENT:-/tmp/graft-kafka-consumer-ft.log}"
TEST_STATUS=0

check() {
    local actual="${1}" expected="${2}" description="${3:-}"
    if [[ "${actual}" =~ ${expected} ]]; then
        echo "Check success: ${description}"
    else
        echo "Check failed: ${description} (actual: \`${actual}\` | expected: \`${expected}\`)"
        TEST_STATUS=1
    fi
}

cd "$(dirname "$0")/.."
rm -f "${LOG_CLIENT}"

${KAFKA_TOPICS_CMD} --bootstrap-server "${BROKER}" --topic "${TOPIC}" --create --partitions 5

kcat -b "${BROKER}" -P -t "${TOPIC}" -K, <<< "keyA,hello kafka"
kcat -b "${BROKER}" -P -t "${TOPIC}" -K, <<< "keyB,hello again"

sbt -batch "runMain graft.tools.KafkaClient --mode consume --broker ${BROKER} --topic ${TOPIC} --print-messages true" > "${LOG_CLIENT}" 2>&1

result=$(grep "Message consumed: " "${LOG_CLIENT}")

check "$(sed --quiet '1p' <<< "${result}")" "key=keyA value=hello kafka" "First message (key and payload)"
check "$(sed --quiet '2p' <<< "${result}")" "key=keyB value=hello again" "Second message (key and payload)"

${KAFKA_TOPICS_CMD} --bootstrap-server "${BROKER}" --topic "${TOPIC}" --delete
echo "\`${TOPIC}\` topic has been deleted"

exit ${TEST_STATUS}
