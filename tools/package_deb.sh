#!/usr/bin/env bash
# Debian packaging for the graft Spark library — the .deb analog of the
# reference's CPack step (/root/reference/.github/workflows/release.yml:
# `cmake --build . --target package` producing mapreduce-0.0.N-Linux.deb).
# A JVM library's payload is its jar; the package installs it under
# /usr/share/graft/ plus a spark-submit wrapper under /usr/bin/ so
# `graft-submit --class graft.Bench` works on any host with Spark.
#
# Usage: tools/package_deb.sh <version> [jar]
#   version  e.g. "0.0.${GITHUB_RUN_NUMBER}" (mirrors the reference's
#            0.0.<run_number> scheme)
#   jar      path to the library jar (default: target/scala-2.13/*.jar)
set -euo pipefail

VERSION="${1:?usage: package_deb.sh <version> [jar]}"
JAR="${2:-$(ls target/scala-2.13/*.jar | head -1)}"
[ -f "$JAR" ] || { echo "jar not found: $JAR" >&2; exit 1; }

PKG="graft-spark"
STAGE="$(mktemp -d)"
trap 'rm -rf "$STAGE"' EXIT
chmod 0755 "$STAGE" # mktemp defaults to 0700; the package root must be world-readable

mkdir -p "$STAGE/DEBIAN" "$STAGE/usr/share/graft" "$STAGE/usr/bin"
cp "$JAR" "$STAGE/usr/share/graft/graft-spark.jar"

cat > "$STAGE/usr/bin/graft-submit" << 'WRAP'
#!/usr/bin/env bash
# Runs a graft entrypoint (graft.Bench, graft.Verify, ...) via the host's
# spark-submit. Extra args pass through, e.g.:
#   graft-submit --class graft.Verify /root/testdata/sf0.01 /tmp/out
exec "${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
  "$@" /usr/share/graft/graft-spark.jar
WRAP
chmod 0755 "$STAGE/usr/bin/graft-submit"

INSTALLED_KB=$(du -sk "$STAGE/usr" | cut -f1)
cat > "$STAGE/DEBIAN/control" << CTRL
Package: $PKG
Version: $VERSION
Section: libs
Priority: optional
Architecture: all
Installed-Size: $INSTALLED_KB
Maintainer: graft maintainers
Description: Spark-native analytics engine (graft)
 Scala library of relational, streaming, dedup, similarity, text,
 multimodal and sketch operators for Apache Spark 4.x, with a DuckDB
 oracle harness. Spark is a provided dependency: the host cluster
 supplies the runtime; this package ships only the library jar and the
 graft-submit wrapper.
CTRL

OUT="${PKG}-${VERSION}-Linux.deb"
dpkg-deb --build --root-owner-group "$STAGE" "$OUT" > /dev/null
echo "$OUT"
