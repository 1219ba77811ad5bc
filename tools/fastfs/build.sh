#!/bin/sh
# Build fastlocalfs.jar: the nio-setPermission local filesystem shim
# (see NioRawLocalFileSystem.java). Output lands in
# stellar_etl_airflow_spark/jars/ where session.get_spark picks it up.
# Requires a JDK and the pyspark-bundled hadoop-client-api jar.
set -eu
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(cd "$HERE/../.." && pwd)
HADOOP_JAR=$(python3 - <<'EOF'
import glob, os, pyspark
jars = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "hadoop-client-api-*.jar"))
print(jars[0])
EOF
)
OUT="$REPO/stellar_etl_airflow_spark/jars"
BUILD="$HERE/build"
rm -rf "$BUILD" && mkdir -p "$BUILD" "$OUT"
javac -encoding UTF-8 -cp "$HADOOP_JAR" -d "$BUILD" "$HERE"/src/fastlocalfs/*.java
jar cf "$OUT/fastlocalfs.jar" -C "$BUILD" fastlocalfs
echo "built $OUT/fastlocalfs.jar"
