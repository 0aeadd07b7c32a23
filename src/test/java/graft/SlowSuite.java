package graft;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Suite-level ScalaTest tag for the slow round-pin / scale-shape batteries.
 *
 * Round-12 verdict #2: the full suite outgrew the driver's test window
 * (~25 min; the driver's gate was cut off mid-run and recorded
 * tests_ok=false with zero failing tests). Suites annotated
 * {@code @graft.SlowSuite} are excluded from the default {@code sbt test}
 * run (see build.sbt) so the driver-run gate finishes well inside its
 * budget; the full battery still runs via
 * {@code SPARK_GRAFT_SLOW_TESTS=1 sbt test} (the builder's pre-commit gate).
 */
@TagAnnotation
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.METHOD, ElementType.TYPE})
public @interface SlowSuite {}
