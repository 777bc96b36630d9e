package graft;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Suite-level ScalaTest tag for the SLOW test tier (corpus conformance,
 * recovery, streaming — suites whose wall time is dominated by many Spark
 * jobs). Plain `sbt test` EXCLUDES these suites so the default tier
 * finishes inside the driver's verification window; `sbt slow:test` runs
 * ONLY them (see build.sbt). Run both tiers before declaring the suite
 * green: `sbt test slow:test`.
 */
@TagAnnotation
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.METHOD, ElementType.TYPE})
public @interface SlowTest {}
